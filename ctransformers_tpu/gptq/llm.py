"""GPTQ backend: the reference's second engine, TPU-native.

The reference routes "gptq" repos to an ExLlama CUDA backend with the same
high-level surface (ctransformers/gptq/llm.py: loads the smallest
.safetensors + config.json + tokenizer.model from a directory, 45-60).
Here the same checkpoints (GPTQ-for-LLaMa / AutoGPTQ int4, incl.
act-order) are unpacked into QTensor planes (formats/gptq.py) and served
by the SAME engine as the GGML path — so unlike the reference twin, the
full low-level API (eval/sample/logits/embed) works here too.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from ..formats.gptq import gptq_to_qtensor
from ..formats.safetensors import SafetensorsReader
from ..llm import LLM as _BaseLLM, Config
from ..models.registry import ModelBundle
from ..models.spec import ArchSpec
from ..models.vocab import GGUFVocab
from ..tokenizers.spm import SPMTokenizer
from ..tokenizers.spm_model import parse_spm_model


def _find_safetensors(path: Path) -> Path:
    # pick the smallest model file (reference gptq/llm.py:44-52)
    files = sorted(
        ((f.stat().st_size, f) for f in path.glob("*.safetensors")),
    )
    if not files:
        raise ValueError(f"No .safetensors file found in '{path}'")
    return files[0][1]


def _layer_weight(st: SafetensorsReader, prefix: str):
    """Quantized (qweight/qzeros/scales[/g_idx]) or dense weight -> x@W."""
    if f"{prefix}.qweight" in st:
        return gptq_to_qtensor(
            st.tensor(f"{prefix}.qweight"),
            st.tensor(f"{prefix}.qzeros"),
            st.tensor_f32(f"{prefix}.scales"),
            st.tensor(f"{prefix}.g_idx") if f"{prefix}.g_idx" in st else None,
        )
    # dense (K, N) for x @ W: HF stores (out, in)
    return np.ascontiguousarray(st.tensor_f32(f"{prefix}.weight").T)


def load_bundle(model_dir: str, context_length: int = -1) -> ModelBundle:
    path = Path(model_dir)
    with open(path / "config.json") as f:
        cfg = json.load(f)
    st = SafetensorsReader(str(_find_safetensors(path)))

    n_head = cfg["num_attention_heads"]
    spec = ArchSpec(
        name="llama",
        n_vocab=cfg["vocab_size"],
        n_ctx=context_length
        if context_length > 0
        else cfg.get("max_position_embeddings", 2048),
        n_embd=cfg["hidden_size"],
        n_head=n_head,
        n_layer=cfg["num_hidden_layers"],
        n_head_kv=cfg.get("num_key_value_heads", n_head),
        n_ff=cfg["intermediate_size"],
        # HF llama rotate_half == ggml neox-mode rope over the full head
        rope_mode="neox",
        n_rot=cfg["hidden_size"] // n_head,
        rope_base=float(cfg.get("rope_theta", 10000.0)),
        norm="rmsnorm",
        norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
        act="silu_gate",
    )

    params = {
        "wte": st.tensor_f32("model.embed_tokens.weight"),
        "ln_f_g": st.tensor_f32("model.norm.weight"),
        "lm_head": _layer_weight(st, "lm_head")
        if "lm_head.qweight" in st or "lm_head.weight" in st
        else np.ascontiguousarray(st.tensor_f32("model.embed_tokens.weight").T),
        "layers": [],
    }
    for i in range(spec.n_layer):
        p = f"model.layers.{i}"
        params["layers"].append(
            {
                "ln1_g": st.tensor_f32(f"{p}.input_layernorm.weight"),
                "wq": _layer_weight(st, f"{p}.self_attn.q_proj"),
                "wk": _layer_weight(st, f"{p}.self_attn.k_proj"),
                "wv": _layer_weight(st, f"{p}.self_attn.v_proj"),
                "wo": _layer_weight(st, f"{p}.self_attn.o_proj"),
                "ln2_g": st.tensor_f32(f"{p}.post_attention_layernorm.weight"),
                "w_gate": _layer_weight(st, f"{p}.mlp.gate_proj"),
                "w_up": _layer_weight(st, f"{p}.mlp.up_proj"),
                "w_down": _layer_weight(st, f"{p}.mlp.down_proj"),
            }
        )

    pieces, scores, types = parse_spm_model(str(path / "tokenizer.model"))
    vocab = GGUFVocab(pieces, scores, types, vocab_type="spm")
    tokenizer = SPMTokenizer(vocab)
    return ModelBundle(
        spec,
        params,
        vocab,
        tokenizer,
        architecture="gptq",
        sampler="llama",
        supports_embeddings=True,
    )


class LLM(_BaseLLM):
    def __init__(
        self,
        model_path: str,
        model_type: Optional[str] = None,
        *,
        config: Optional[Config] = None,
        lib: Optional[str] = None,
    ):
        """Loads a GPTQ model from a local directory.

        Args:
            model_path: The path to a model directory.
            model_type: Ignored (GPTQ checkpoints self-describe).
            config: `Config` object.
            lib: Ignored (kept for API compatibility).
        """
        config = config or Config()
        self._model_path = model_path
        self._config = config
        self._context = []
        self._mirostat_state = None
        if not Path(model_path).is_dir():
            raise ValueError(f"Model path '{model_path}' doesn't exist.")
        bundle = load_bundle(model_path, context_length=config.context_length)
        self._init_from_bundle(bundle, "gptq")

    def sample(self, **kwargs) -> int:
        """GPTQ sampling: the reference's GPTQ twin maps the repetition
        penalty onto ExLlama's DECAYING schedule (gptq/llm.py:174-176:
        penalty_max=repetition_penalty, sustain=last_n_tokens,
        decay=last_n_tokens//2) — the penalty fades linearly to 1.0 for
        tokens older than the sustain window. Extended sampler knobs
        (mirostat, tfs, ...) fall through to the base chain unchanged."""
        from ..engine import sampler as samplers
        from ..llm import get

        extended = any(
            kwargs.get(k) is not None
            for k in (
                "tfs_z", "typical_p", "frequency_penalty",
                "presence_penalty", "mirostat",
            )
        )
        if extended:
            return super().sample(**kwargs)
        cfg = self.config
        top_k = get(kwargs.get("top_k"), cfg.top_k)
        top_p = get(kwargs.get("top_p"), cfg.top_p)
        temperature = get(kwargs.get("temperature"), cfg.temperature)
        repetition_penalty = get(
            kwargs.get("repetition_penalty"), cfg.repetition_penalty
        )
        last_n = get(kwargs.get("last_n_tokens"), cfg.last_n_tokens)
        seed = get(kwargs.get("seed"), cfg.seed)
        if last_n < 0:
            last_n = self.context_length
        sustain, decay = last_n, last_n // 2
        if self._engine.logits is None:
            return self.eos_token_id
        return samplers.sample_llama_decayed(
            self._engine.logits,
            top_k=top_k,
            top_p=top_p,
            temperature=temperature,
            repetition_penalty=repetition_penalty,
            # the decay window extends past the sustain window
            last_tokens=self._context[-(sustain + decay):] if sustain + decay
            else [],
            seed=seed,
            sustain=sustain,
            decay=decay,
            rng=self._rng,
        )
