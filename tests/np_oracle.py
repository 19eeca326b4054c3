"""Clean-room numpy oracle for the GPT-NeoX-family forward pass.

The reference's precompiled gpt_neox/dollyv2 example binaries produce NaN
or divergent logits on tiny synthetic models (their mem_per_token scratch
estimation misbehaves), so neox-family parity is checked against this
independent implementation of the documented semantics instead: it reads
the model FILE directly (its own layout interpretation, not the loader's)
and follows gpt-neox.cc exactly — fused per-head [q|k|v] views
(gpt-neox.cc:440-470 strides), partial neox RoPE (ggml.c rope mode 2:
global theta across ne0/n_dims blocks), par_res wiring (gpt-neox.cc:
579-610), ggml_norm eps 1e-5, tanh-approx GELU.
"""

import numpy as np

from ctransformers_tpu.formats.ggml_legacy import LegacyReader


def _ln(x, g, b, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    xc = x - m
    v = (xc * xc).mean(-1, keepdims=True)
    return xc / np.sqrt(v + eps) * g + b


def _gelu(x):
    return 0.5 * x * (1 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


def _rope_neox(x, n_past, n_dims, base=10000.0):
    """x: (T, H, dh). ggml.c rope mode 2: for block ib and step ic,
    pair (ib*n_dims + ic/2, +n_dims/2), theta decays globally."""
    t_len, h, dh = x.shape
    out = x.copy()
    theta_scale = base ** (-2.0 / n_dims)
    for t in range(t_len):
        p = n_past + t
        for hh in range(h):
            theta = float(p)
            for ib in range(dh // n_dims):
                for ic in range(0, n_dims, 2):
                    c, s = np.cos(theta), np.sin(theta)
                    theta *= theta_scale
                    i0 = ib * n_dims + ic // 2
                    x0 = x[t, hh, i0]
                    x1 = x[t, hh, i0 + n_dims // 2]
                    out[t, hh, i0] = x0 * c - x1 * s
                    out[t, hh, i0 + n_dims // 2] = x0 * s + x1 * c
    return out


def neox_logits(path, tokens):
    """Last-token logits for a gpt-neox-format file (all-at-once eval)."""
    r = LegacyReader(path)
    n_vocab = r.read_i32()
    r.read_i32()  # n_ctx
    n_embd = r.read_i32()
    n_head = r.read_i32()
    n_layer = r.read_i32()
    n_rot = r.read_i32()
    par_res = r.read_i32()
    r.read_i32()  # ftype
    if r.read_i32() != n_vocab:
        raise ValueError("vocab mismatch")
    r.read_vocab(n_vocab)
    r.index_tensors()
    t = r.tensor_f32
    dh = n_embd // n_head
    tlen = len(tokens)

    x = t("gpt_neox.embed_in.weight")[tokens]  # (T, D)
    for i in range(n_layer):
        p = f"gpt_neox.layers.{i}"
        ln1 = _ln(x, t(f"{p}.input_layernorm.weight"), t(f"{p}.input_layernorm.bias"))
        qkv = ln1 @ t(f"{p}.attention.query_key_value.weight").T + t(
            f"{p}.attention.query_key_value.bias"
        )  # (T, 3D); row layout per head: [q(dh) k(dh) v(dh)]
        qkv = qkv.reshape(tlen, n_head, 3, dh)
        q = _rope_neox(qkv[:, :, 0], 0, n_rot)
        k = _rope_neox(qkv[:, :, 1], 0, n_rot)
        v = qkv[:, :, 2]
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(dh)
        mask = np.tril(np.ones((tlen, tlen), bool))
        scores = np.where(mask[None], scores, -np.inf)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ctx = np.einsum("hts,shd->thd", probs, v).reshape(tlen, n_embd)
        attn = ctx @ t(f"{p}.attention.dense.weight").T + t(f"{p}.attention.dense.bias")

        def ff(inp):
            h = _ln(
                inp,
                t(f"{p}.post_attention_layernorm.weight"),
                t(f"{p}.post_attention_layernorm.bias"),
            )
            h = _gelu(h @ t(f"{p}.mlp.dense_h_to_4h.weight").T + t(f"{p}.mlp.dense_h_to_4h.bias"))
            return h @ t(f"{p}.mlp.dense_4h_to_h.weight").T + t(f"{p}.mlp.dense_4h_to_h.bias")

        if par_res:
            x = x + attn + ff(x)  # gpt-neox.cc:598-609
        else:
            inp_ff = x + attn  # gpt-neox.cc:591-597
            x = inp_ff + ff(inp_ff)

    x = _ln(x, t("gpt_neox.final_layer_norm.weight"), t("gpt_neox.final_layer_norm.bias"))
    return (x @ t("embed_out.weight").T)[-1]
