"""GBNF grammar-constrained sampling.

Clone of the reference's grammar engine (llama.cpp:3429-3804:
decode_utf8, match_char/match_partial_char, advance_stack, accept,
reject_candidates) plus llama_sample_grammar / llama_grammar_accept_token
(llama.cpp:4085-4124, 4304-4332), with a GBNF *text* parser on top (the
reference keeps that in its examples; the element model here is identical:
END/ALT/RULE_REF/CHAR/CHAR_NOT/CHAR_RNG_UPPER/CHAR_ALT).

Grammar state is a set of pushdown stacks over rule elements; sampling
masks every token whose UTF-8 decoding cannot be consumed by any stack,
and EOS is only allowed once some stack has fully matched.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# element types (llama.h llama_gretype)
END = 0
ALT = 1
RULE_REF = 2
CHAR = 3
CHAR_NOT = 4
CHAR_RNG_UPPER = 5
CHAR_ALT = 6

Element = Tuple[int, int]  # (type, value)
Pos = Tuple[int, int]  # (rule index, element index)


# ---------------------------------------------------------------------------
# GBNF text parser -> rules (each rule: flat element list ending in END)
# ---------------------------------------------------------------------------


class GrammarParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.rule_ids: Dict[str, int] = {}
        self.rules: Dict[int, List[Element]] = {}

    # -- lexing helpers ----------------------------------------------------

    def _ws(self) -> None:
        self._space(newline_ok=True)

    def _ws_inline(self) -> None:
        self._space(newline_ok=False)

    def _space(self, newline_ok: bool) -> None:
        """Skip spaces/tabs/comments; newlines only when `newline_ok` —
        the grammar-parser.cpp rule: newlines are allowed right after
        '::=', after '|', and inside parentheses, while a bare newline
        after an atom at top level ends the rule. This is what lets the
        canonical multi-line grammars (json.gbnf etc.) parse."""
        while self.pos < len(self.text):
            c = self.text[self.pos]
            if c == "#":
                while self.pos < len(self.text) and self.text[self.pos] != "\n":
                    self.pos += 1
            elif c in " \t" or (newline_ok and c in "\r\n"):
                self.pos += 1
            else:
                break

    def _name(self) -> str:
        start = self.pos
        while self.pos < len(self.text) and (
            self.text[self.pos].isalnum() or self.text[self.pos] in "-_"
        ):
            self.pos += 1
        if self.pos == start:
            raise GrammarParseError(f"expected name at {start}")
        return self.text[start : self.pos]

    def _expect(self, s: str) -> None:
        if not self.text.startswith(s, self.pos):
            raise GrammarParseError(f"expected {s!r} at {self.pos}")
        self.pos += len(s)

    def _char(self) -> int:
        """One character, handling escapes; returns a code point."""
        c = self.text[self.pos]
        self.pos += 1
        if c != "\\":
            return ord(c)
        e = self.text[self.pos]
        self.pos += 1
        if e == "x":
            v = int(self.text[self.pos : self.pos + 2], 16)
            self.pos += 2
            return v
        if e == "u":
            v = int(self.text[self.pos : self.pos + 4], 16)
            self.pos += 4
            return v
        if e == "U":
            v = int(self.text[self.pos : self.pos + 8], 16)
            self.pos += 8
            return v
        return {"n": 10, "t": 9, "r": 13}.get(e, ord(e))

    # -- rule ids ----------------------------------------------------------

    def _rule_id(self, name: str) -> int:
        if name not in self.rule_ids:
            self.rule_ids[name] = len(self.rule_ids)
        return self.rule_ids[name]

    def _fresh_rule(self, base: str) -> int:
        i = 1
        while f"{base}_{i}" in self.rule_ids:
            i += 1
        return self._rule_id(f"{base}_{i}")

    # -- grammar productions -----------------------------------------------

    def parse(self) -> Tuple[List[List[Element]], int]:
        self._ws()
        while self.pos < len(self.text):
            name = self._name()
            self._ws_inline()
            self._expect("::=")
            self._space(newline_ok=True)  # body may start on the next line
            rid = self._rule_id(name)
            elems = self._alternates(name)
            self.rules[rid] = elems
            self._ws()
        if "root" not in self.rule_ids:
            raise GrammarParseError("grammar must define a 'root' rule")
        n = len(self.rule_ids)
        out: List[List[Element]] = [[(END, 0)] for _ in range(n)]
        for rid, elems in self.rules.items():
            out[rid] = elems
        for name, rid in self.rule_ids.items():
            if rid not in self.rules:
                raise GrammarParseError(f"undefined rule '{name}'")
        return out, self.rule_ids["root"]

    def _alternates(self, base: str, nested: bool = False) -> List[Element]:
        elems = self._sequence(base, nested)
        self._space(newline_ok=nested)
        while self.pos < len(self.text) and self.text[self.pos] == "|":
            self.pos += 1
            self._space(newline_ok=True)  # alternates may continue next line
            elems.append((ALT, 0))
            elems += self._sequence(base, nested)
            self._space(newline_ok=nested)
        elems.append((END, 0))
        return elems

    def _sequence(self, base: str, nested: bool = False) -> List[Element]:
        out: List[Element] = []
        while True:
            self._space(newline_ok=nested)
            if self.pos >= len(self.text):
                break
            c = self.text[self.pos]
            start_len = len(out)
            if c == '"':
                self.pos += 1
                while self.text[self.pos] != '"':
                    out.append((CHAR, self._char()))
                self.pos += 1
            elif c == "[":
                self.pos += 1
                neg = self.text[self.pos] == "^"
                if neg:
                    self.pos += 1
                first = True
                while self.text[self.pos] != "]":
                    cp = self._char()
                    t = (CHAR_NOT if neg else CHAR) if first else CHAR_ALT
                    out.append((t, cp))
                    first = False
                    if (
                        self.text[self.pos] == "-"
                        and self.text[self.pos + 1] != "]"
                    ):
                        self.pos += 1
                        out.append((CHAR_RNG_UPPER, self._char()))
                self.pos += 1
                # start_len from before the branch already marks the class
                # start — a repetition operator wraps the whole class
            elif c == "(":
                self.pos += 1
                rid = self._fresh_rule(base)
                self.rules[rid] = self._alternates(base, nested=True)
                self._space(newline_ok=True)
                self._expect(")")
                out.append((RULE_REF, rid))
                start_len = len(out) - 1
            elif c.isalnum() or c in "-_":
                save = self.pos
                name = self._name()
                self._ws_inline()
                if self.text.startswith("::=", self.pos):
                    self.pos = save  # next rule definition begins
                    break
                out.append((RULE_REF, self._rule_id(name)))
                start_len = len(out) - 1
            else:
                break

            # repetition operators apply to the last atom
            if self.pos < len(self.text) and self.text[self.pos] in "*+?":
                op = self.text[self.pos]
                self.pos += 1
                atom = out[start_len:]
                del out[start_len:]
                rid = self._fresh_rule(base)
                if op == "*":
                    # S ::= atom S |
                    self.rules[rid] = atom + [(RULE_REF, rid), (ALT, 0), (END, 0)]
                    out.append((RULE_REF, rid))
                elif op == "+":
                    # S ::= atom S | atom
                    self.rules[rid] = (
                        atom + [(RULE_REF, rid), (ALT, 0)] + atom + [(END, 0)]
                    )
                    out.append((RULE_REF, rid))
                else:  # ?
                    self.rules[rid] = atom + [(ALT, 0), (END, 0)]
                    out.append((RULE_REF, rid))
        return out


def parse_gbnf(text: str) -> Tuple[List[List[Element]], int]:
    """-> (rules, root_rule_index)."""
    try:
        return _Parser(text).parse()
    except GrammarParseError:
        raise
    except (IndexError, ValueError) as e:
        # truncated strings / EOF escapes / bad hex digits surface from
        # raw indexing and int() — callers catch GrammarParseError
        raise GrammarParseError(f"malformed grammar: {e}") from e


# ---------------------------------------------------------------------------
# Grammar state machine (llama.cpp semantics)
# ---------------------------------------------------------------------------


def _is_end(elem: Element) -> bool:
    return elem[0] in (END, ALT)


class Grammar:
    def __init__(self, rules: List[List[Element]], root: int):
        self.rules = rules
        self.stacks: List[Tuple[Pos, ...]] = []
        self.partial_value = 0
        self.partial_remain = 0
        # initial stacks from the root rule's alternates (llama_grammar_init)
        i = 0
        rule = rules[root]
        while True:
            stack: List[Pos] = []
            if not _is_end(rule[i]):
                stack.append((root, i))
            self._advance(tuple(stack), self.stacks)
            while not _is_end(rule[i]):
                i += 1
            if rule[i][0] == ALT:
                i += 1
            else:
                break

    @classmethod
    def from_gbnf(cls, text: str) -> "Grammar":
        rules, root = parse_gbnf(text)
        return cls(rules, root)

    def _elem(self, pos: Pos) -> Element:
        return self.rules[pos[0]][pos[1]]

    def _advance(self, stack: Tuple[Pos, ...], out: List) -> None:
        """llama_grammar_advance_stack."""
        if not stack:
            if stack not in out:
                out.append(stack)
            return
        pos = stack[-1]
        t, v = self._elem(pos)
        if t == RULE_REF:
            sub = self.rules[v]
            i = 0
            nxt = (pos[0], pos[1] + 1)
            while True:
                new_stack = list(stack[:-1])
                if not _is_end(self._elem(nxt)):
                    new_stack.append(nxt)
                if not _is_end(sub[i]):
                    new_stack.append((v, i))
                self._advance(tuple(new_stack), out)
                while not _is_end(sub[i]):
                    i += 1
                if sub[i][0] == ALT:
                    i += 1
                else:
                    break
        elif t in (CHAR, CHAR_NOT):
            if stack not in out:
                out.append(stack)
        else:
            raise AssertionError("stack on invalid element")

    def _match_char(self, pos: Pos, chr_: int) -> Tuple[bool, Pos]:
        """llama_grammar_match_char: walk the char-alt chain."""
        rule = self.rules[pos[0]]
        i = pos[1]
        t = rule[i][0]
        positive = t == CHAR
        found = False
        while True:
            if i + 1 < len(rule) and rule[i + 1][0] == CHAR_RNG_UPPER:
                found = found or (rule[i][1] <= chr_ <= rule[i + 1][1])
                i += 2
            else:
                found = found or rule[i][1] == chr_
                i += 1
            if not (i < len(rule) and rule[i][0] == CHAR_ALT):
                break
        return found == positive, (pos[0], i)

    def _match_partial(self, pos: Pos, value: int, n_remain: int) -> bool:
        """llama_grammar_match_partial_char."""
        rule = self.rules[pos[0]]
        positive = rule[pos[1]][0] == CHAR
        if n_remain < 0 or (n_remain == 1 and value < 2):
            return False
        low = value << (n_remain * 6)
        high = low | ((1 << (n_remain * 6)) - 1)
        if low == 0:
            if n_remain == 2:
                low = 1 << 11
            elif n_remain == 3:
                low = 1 << 16
        i = pos[1]
        while True:
            if i + 1 < len(rule) and rule[i + 1][0] == CHAR_RNG_UPPER:
                if rule[i][1] <= high and low <= rule[i + 1][1]:
                    return positive
                i += 2
            else:
                if low <= rule[i][1] <= high:
                    return positive
                i += 1
            if not (i < len(rule) and rule[i][0] == CHAR_ALT):
                break
        return not positive

    def _accept_char(self, chr_: int) -> None:
        """llama_grammar_accept."""
        new_stacks: List[Tuple[Pos, ...]] = []
        for stack in self.stacks:
            if not stack:
                continue
            ok, after = self._match_char(stack[-1], chr_)
            if ok:
                new_stack = list(stack[:-1])
                if not _is_end(self._elem(after)):
                    new_stack.append(after)
                self._advance(tuple(new_stack), new_stacks)
        self.stacks = new_stacks

    # -- candidate filtering ------------------------------------------------

    def _reject_for_stack(self, stack, candidates):
        """llama_grammar_reject_candidates_for_stack. Candidates are
        (index, cp_offset, code_points, (pvalue, premain))."""
        rejects = []
        if not stack:
            for tok in candidates:
                idx, off, cps, partial = tok
                if off < len(cps) or partial[1] != 0:
                    rejects.append(tok)
            return rejects
        pos = stack[-1]
        nxt = []
        for tok in candidates:
            idx, off, cps, partial = tok
            if off >= len(cps):
                if partial[1] != 0 and not self._match_partial(
                    pos, partial[0], partial[1]
                ):
                    rejects.append(tok)
            elif self._match_char(pos, cps[off])[0]:
                nxt.append((idx, off + 1, cps, partial))
            else:
                rejects.append(tok)
        after = self._match_char(pos, 0)[1]
        stack_after = list(stack[:-1])
        if not _is_end(self._elem(after)):
            stack_after.append(after)
        next_stacks: List[Tuple[Pos, ...]] = []
        self._advance(tuple(stack_after), next_stacks)
        for idx, off, cps, partial in self._reject(next_stacks, nxt):
            rejects.append((idx, off - 1, cps, partial))
        return rejects

    def _reject(self, stacks, candidates):
        if not candidates:
            return []
        rejects = self._reject_for_stack(stacks[0], candidates)
        for stack in stacks[1:]:
            rejects = self._reject_for_stack(stack, rejects)
        return rejects

    # -- public API ---------------------------------------------------------

    def can_stop(self) -> bool:
        return any(len(s) == 0 for s in self.stacks)

    def filter_logits(
        self,
        logits: np.ndarray,
        detokenize,
        eos_token_id: int,
    ) -> np.ndarray:
        """llama_sample_grammar: -inf for tokens the grammar rejects."""
        out = np.array(logits, np.float32, copy=True)
        candidates = []
        for tid in range(out.shape[0]):
            if tid == eos_token_id:
                continue
            piece = detokenize(tid)
            if not piece:
                # empty pieces (control tokens) are masked outright
                # (llama_sample_grammar, llama.cpp:4109-4111) — leaving
                # them samplable lets generation emit tokens that never
                # advance the grammar
                out[tid] = -np.inf
                continue
            cps, partial = decode_utf8(
                piece, self.partial_value, self.partial_remain
            )
            candidates.append((tid, 0, tuple(cps), partial))
        for idx, _, _, _ in self._reject(self.stacks, candidates):
            out[idx] = -np.inf
        if not self.can_stop():
            out[eos_token_id] = -np.inf
        return out

    def accept_token(self, token: int, detokenize, eos_token_id: int) -> None:
        """llama_grammar_accept_token."""
        if token == eos_token_id:
            if not self.can_stop():
                raise ValueError("grammar cannot accept EOS here")
            return
        piece = detokenize(token)
        cps, (pvalue, premain) = decode_utf8(
            piece, self.partial_value, self.partial_remain
        )
        for cp in cps:
            self._accept_char(cp)
            if not self.stacks:
                raise ValueError(f"token {token} violates the grammar")
        self.partial_value = pvalue
        self.partial_remain = premain


def decode_utf8(
    data: bytes, partial_value: int = 0, partial_remain: int = 0
) -> Tuple[List[int], Tuple[int, int]]:
    """llama.cpp decode_utf8: code points + trailing partial sequence.
    (The reference appends a 0 terminator; here the list holds only real
    code points and callers compare offsets to len.)"""
    lookup = [1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 2, 2, 3, 4]
    cps: List[int] = []
    value = partial_value
    n_remain = partial_remain
    i = 0
    while i < len(data) and n_remain > 0:
        b = data[i]
        if (b >> 6) != 2:
            return [0], (0, -1)
        value = (value << 6) + (b & 0x3F)
        i += 1
        n_remain -= 1
    if partial_remain > 0 and n_remain == 0:
        cps.append(value)
    while i < len(data):
        first = data[i]
        n_remain = lookup[first >> 4] - 1
        if n_remain < 0:
            return [0], (0, n_remain)
        mask = (1 << (7 - n_remain)) - 1
        value = first & mask
        i += 1
        while i < len(data) and n_remain > 0:
            value = (value << 6) + (data[i] & 0x3F)
            i += 1
            n_remain -= 1
        if n_remain == 0:
            cps.append(value)
    return cps, (value, n_remain)
