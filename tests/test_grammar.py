"""GBNF grammar engine: parser, state machine, constrained generation."""

import numpy as np
import pytest

from ctransformers_tpu.engine.grammar import (
    Grammar,
    GrammarParseError,
    decode_utf8,
    parse_gbnf,
)


def _accepts(g: Grammar, text: str, detok=None) -> bool:
    try:
        for ch in text:
            g._accept_char(ord(ch))
            if not g.stacks:
                return False
    except ValueError:
        return False
    return True


def test_decode_utf8():
    cps, partial = decode_utf8("héllo".encode())
    assert cps == [ord(c) for c in "héllo"]
    assert partial[1] == 0
    # split a 2-byte char across calls
    b = "é".encode()
    cps1, p1 = decode_utf8(b[:1])
    assert cps1 == [] and p1[1] == 1
    cps2, p2 = decode_utf8(b[1:], p1[0], p1[1])
    assert cps2 == [ord("é")] and p2[1] == 0


def test_literal_alternates():
    g = Grammar.from_gbnf('root ::= "yes" | "no"')
    assert _accepts(Grammar.from_gbnf('root ::= "yes" | "no"'), "yes")
    assert _accepts(Grammar.from_gbnf('root ::= "yes" | "no"'), "no")
    g = Grammar.from_gbnf('root ::= "yes" | "no"')
    g._accept_char(ord("n"))
    assert g.stacks  # "n..." viable
    g2 = Grammar.from_gbnf('root ::= "yes" | "no"')
    g2._accept_char(ord("x"))
    assert not g2.stacks  # dead


def test_char_class_and_repetition():
    g = Grammar.from_gbnf("root ::= [a-z]+")
    assert _accepts(g, "hello")
    assert g.can_stop()
    g2 = Grammar.from_gbnf("root ::= [a-z]+")
    g2._accept_char(ord("7"))
    assert not g2.stacks


def test_negated_class():
    g = Grammar.from_gbnf('root ::= [^0-9] [^0-9]')
    assert _accepts(g, "ab")
    g2 = Grammar.from_gbnf('root ::= [^0-9] [^0-9]')
    g2._accept_char(ord("5"))
    assert not g2.stacks


def test_rule_refs_and_groups():
    text = """
root ::= greeting " " name
greeting ::= "hi" | "yo"
name ::= ("bob" | "amy")
"""
    assert _accepts(Grammar.from_gbnf(text), "hi bob")
    assert _accepts(Grammar.from_gbnf(text), "yo amy")
    g = Grammar.from_gbnf(text)
    for ch in "hi bob":
        g._accept_char(ord(ch))
    assert g.can_stop()


def test_optional_and_star():
    text = 'root ::= "a"? "b"*'
    g = Grammar.from_gbnf(text)
    assert g.can_stop()  # empty string valid
    g2 = Grammar.from_gbnf(text)
    assert _accepts(g2, "abbb")
    assert g2.can_stop()


def test_undefined_rule_raises():
    with pytest.raises(GrammarParseError):
        parse_gbnf("root ::= missing")


def test_json_like_grammar():
    text = r"""
root ::= object
object ::= "{" ws ( pair ("," ws pair)* )? "}"
pair ::= string ":" ws value
value ::= string | number | object
string ::= "\"" [a-z]* "\""
number ::= [0-9]+
ws ::= " "*
"""
    assert _accepts(Grammar.from_gbnf(text), '{"a": 1,"bc": {"d": 22}}'.replace(": ", ":"))


def test_filter_logits_and_accept_token():
    # vocab: 0:'y' 1:'e' 2:'s' 3:'n' 4:'o' 5:<eos> 6:'x'
    vocab = [b"y", b"e", b"s", b"n", b"o", b"", b"x"]

    def detok(t):
        return vocab[t]

    g = Grammar.from_gbnf('root ::= "yes" | "no"')
    logits = np.zeros(7, np.float32)
    f = g.filter_logits(logits, detok, eos_token_id=5)
    assert np.isfinite(f[0]) and np.isfinite(f[3])  # y, n viable
    assert f[6] == -np.inf and f[1] == -np.inf  # x, e not
    assert f[5] == -np.inf  # cannot stop yet

    g.accept_token(0, detok, 5)  # 'y'
    f = g.filter_logits(logits, detok, eos_token_id=5)
    assert np.isfinite(f[1]) and f[3] == -np.inf  # only 'e' now
    g.accept_token(1, detok, 5)
    g.accept_token(2, detok, 5)
    f = g.filter_logits(logits, detok, eos_token_id=5)
    assert np.isfinite(f[5])  # EOS allowed after full match
    g.accept_token(5, detok, 5)


def test_multibyte_token_split():
    """A token carrying half of a UTF-8 char is only kept when some
    completion could match (partial-char semantics)."""
    e = "é".encode()
    vocab = [e[:1], e[1:], b"a", b""]

    def detok(t):
        return vocab[t]

    g = Grammar.from_gbnf('root ::= "é"')
    logits = np.zeros(4, np.float32)
    f = g.filter_logits(logits, detok, eos_token_id=3)
    assert np.isfinite(f[0])  # first half of é viable
    assert f[2] == -np.inf
    g.accept_token(0, detok, 3)
    f = g.filter_logits(logits, detok, eos_token_id=3)
    assert np.isfinite(f[1])
    g.accept_token(1, detok, 3)
    assert g.can_stop()


def test_constrained_generation_end_to_end(tmp_path):
    from ctransformers_tpu import AutoModelForCausalLM

    from .fixtures import build_gpt2

    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=71)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    out = llm(
        "hello",
        max_new_tokens=8,
        seed=5,
        grammar='root ::= ("the" | " the" | "cat" | " cat")*',
    )
    assert set(out.replace(" ", "").replace("the", "").replace("cat", "")) == set()


MULTILINE_JSON_GBNF = r"""
# canonical llama.cpp-style multi-line grammar
root   ::= object
value  ::= object | array | string | number |
           ("true" | "false" | "null") ws

object ::=
  "{" ws (
            string ":" ws value
    ("," ws string ":" ws value)*
  )? "}" ws

array  ::=
  "[" ws (
            value
    ("," ws value)*
  )? "]" ws

string ::=
  "\"" (
    [^"\\] |
    "\\" (["\\/bfnrt] | "u" [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F])
  )* "\"" ws

number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? ws

ws ::= ([ \t\n] ws)?
"""


def test_multiline_grammar_parses_and_accepts_json():
    from ctransformers_tpu.engine.grammar import Grammar, parse_gbnf

    rules, root = parse_gbnf(MULTILINE_JSON_GBNF)
    g = Grammar(rules, root)
    for ch in '{"a": [1, true, "x\\n"], "b": {"c": -2.5e3}}':
        g._accept_char(ord(ch))
        assert g.stacks, f"grammar died at {ch!r}"
    assert g.can_stop()


def test_malformed_grammar_raises_parse_error():
    from ctransformers_tpu.engine.grammar import (
        GrammarParseError,
        parse_gbnf,
    )

    for bad in ('root ::= "abc', 'root ::= "a" [x', r'root ::= "\x"',
                r'root ::= "\u12"'):
        with pytest.raises(GrammarParseError):
            parse_gbnf(bad)


def test_empty_piece_tokens_are_masked():
    """Control tokens that detokenize to b'' must get -inf
    (llama_sample_grammar, llama.cpp:4109-4111) — otherwise sampling can
    emit tokens that never advance the grammar."""
    from ctransformers_tpu.engine.grammar import Grammar, parse_gbnf

    rules, root = parse_gbnf('root ::= "ab"')
    g = Grammar(rules, root)
    pieces = {0: b"", 1: b"", 2: b"a", 3: b"b"}
    logits = np.zeros(4, np.float32)
    out = g.filter_logits(logits, lambda t: pieces[t], eos_token_id=0)
    assert out[1] == -np.inf  # empty piece masked
    assert out[2] == 0.0  # 'a' allowed
    assert out[3] == -np.inf  # 'b' rejected first
