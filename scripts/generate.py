#!/usr/bin/env python
"""Generation CLI (the llama.cpp `main` analog).

Usage:
    python scripts/generate.py MODEL "prompt text" [--model-type T]
        [--n 128] [--seed -1] [--temperature 0.8] [--top-k 40]
        [--top-p 0.95] [--repetition-penalty 1.1] [--grammar FILE]
        [--lora FILE] [--fast] [--timings]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("prompt")
    ap.add_argument("--model-type", default=None)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--repetition-penalty", type=float, default=1.1)
    ap.add_argument("--grammar", default=None, help="GBNF grammar file")
    ap.add_argument("--lora", default=None, help="ggla adapter path")
    ap.add_argument("--fast", action="store_true",
                    help="fused on-device decode loop")
    ap.add_argument("--draft", default=None,
                    help="draft model path: greedy speculative decoding "
                         "(exact target output, draft only sets speed)")
    ap.add_argument("--gamma", type=int, default=4,
                    help="draft tokens proposed per speculative block")
    ap.add_argument("--timings", action="store_true")
    args = ap.parse_args()

    from ctransformers_tpu import AutoModelForCausalLM

    llm = AutoModelForCausalLM.from_pretrained(
        args.model, model_type=args.model_type, lora=args.lora
    )
    if args.draft:
        from ctransformers_tpu.engine.speculative import decode_speculative

        dllm = AutoModelForCausalLM.from_pretrained(args.draft)
        toks = llm.tokenize(args.prompt)
        llm._engine.eval(toks)
        dllm._engine.eval(toks)
        out = decode_speculative(
            llm._engine, dllm._engine, args.n, gamma=args.gamma
        )
        print(llm.detokenize(out))
        if args.timings:
            llm._engine.print_timings()
        return
    kwargs = dict(
        max_new_tokens=args.n,
        seed=args.seed,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        repetition_penalty=args.repetition_penalty,
    )
    if args.fast:
        print(llm.generate_fast(args.prompt, **kwargs))
    else:
        grammar = Path(args.grammar).read_text() if args.grammar else None
        for chunk in llm(args.prompt, stream=True, grammar=grammar, **kwargs):
            print(chunk, end="", flush=True)
        print()
    if args.timings:
        llm._engine.print_timings()


if __name__ == "__main__":
    main()
