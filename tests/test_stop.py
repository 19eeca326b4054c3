"""Streaming stop-sequence semantics (reference test strategy, SURVEY.md §4).

A mock LLM overrides tokenize/generate/detokenize so no model is loaded;
the cases exercise stops mid-text, stops spanning token boundaries,
suffix-prefix holdback, multiple stops, and newline stops.
"""

import pytest

from ctransformers_tpu.llm import LLM, Config


class MockLLM(LLM):
    """Word-level fake engine: 'tokens' are split words of the response."""

    RESPONSE = " lorem ipsum dolor sit amet, consectetur adipiscing elit"

    def __init__(self, config=None):
        self._config = config or Config()
        self._context = []
        self._model_type = "mock"

    def tokenize(self, text, add_bos_token=None):
        return list(range(len(text.split())))

    def generate(self, tokens, **kwargs):
        for i, _ in enumerate(self.RESPONSE.split()):
            yield i

    def detokenize(self, tokens, decode=True):
        words = self.RESPONSE.split()
        text = "".join(" " + words[t] for t in tokens)
        return text if decode else text.encode()

    def is_eos_token(self, token):
        return False


def run(stop=None, max_new_tokens=None, stream=False):
    llm = MockLLM()
    out = llm("prompt", stop=stop, max_new_tokens=max_new_tokens, stream=stream)
    if stream:
        return list(out)
    return out


FULL = MockLLM.RESPONSE


@pytest.mark.parametrize(
    "stop,expected",
    [
        # no stop -> full text
        (None, FULL),
        ([], FULL),
        # stop mid-text (inside one "token")
        (["dolor"], " lorem ipsum "),
        # stop is a full word with surrounding spaces
        ([" sit "], " lorem ipsum dolor"),
        # stop across token boundaries
        (["ipsum dolor"], " lorem "),
        # multiple stops: first match in the text wins
        (["sit", "dolor"], " lorem ipsum "),
        (["dolor", "sit"], " lorem ipsum "),
        # stop at the very beginning -> empty
        (["lorem"], " "),
        # stop that never occurs -> full text
        (["xyz"], FULL),
        # single-char stop
        ([","], " lorem ipsum dolor sit amet"),
        # stop spanning several words
        (["dolor sit amet"], " lorem ipsum "),
        # overlapping stops
        (["amet, consectetur", "amet"], " lorem ipsum dolor sit "),
        # string instead of list
        ("dolor", " lorem ipsum "),
    ],
)
def test_stop(stop, expected):
    assert run(stop=stop) == expected
    # streaming must join to the identical text
    assert "".join(run(stop=stop, stream=True)) == expected


def test_stream_holdback():
    """While streaming, no yielded chunk may contain a prefix of a stop that
    could still complete into the stop sequence."""
    stop = [" consectetur"]
    chunks = run(stop=stop, stream=True)
    # the final text is everything before the stop
    assert "".join(chunks) == " lorem ipsum dolor sit amet,"
    # no chunk except the last may end with a partial stop prefix
    for chunk in chunks[:-1]:
        for i in range(1, len(stop[0])):
            assert not chunk.endswith(stop[0][:i]) or chunk.endswith(stop[0])


def test_max_new_tokens():
    assert run(max_new_tokens=3) == " lorem ipsum dolor"
    assert run(max_new_tokens=1) == " lorem"
    assert "".join(run(max_new_tokens=2, stream=True)) == " lorem ipsum"


def test_max_new_tokens_with_stop():
    llm = MockLLM()
    assert llm("p", stop=["nothing"], max_new_tokens=2) == " lorem ipsum"
    assert llm("p", stop=["ipsum"], max_new_tokens=100) == " lorem "


def test_newline_stop():
    class NewlineLLM(MockLLM):
        RESPONSE = " hello\nworld"

        def detokenize(self, tokens, decode=True):
            parts = ["", " hello", "\n", "world"]
            text = "".join(parts[t + 1] for t in tokens)
            return text if decode else text.encode()

        def generate(self, tokens, **kwargs):
            yield from range(3)

    llm = NewlineLLM()
    assert llm("p", stop=["\n"]) == " hello"


def test_utf8_streaming():
    """Multi-byte characters split across tokens must assemble correctly."""

    class Utf8LLM(MockLLM):
        PIECES = ["\xe4\xbd".encode("latin-1"), "\xa0".encode("latin-1"), b" ok"]

        def generate(self, tokens, **kwargs):
            yield from range(len(self.PIECES))

        def detokenize(self, tokens, decode=True):
            data = b"".join(self.PIECES[t] for t in tokens)
            return data.decode(errors="ignore") if decode else data

    llm = Utf8LLM()
    out = llm("p")
    assert out == "你 ok"
