#!/usr/bin/env python3
"""Regenerate API docs from docstrings (reference: scripts/docs.py, which
uses lazydocs; this version is dependency-free). Writes docs/api.md and
splices it into README.md between <!-- API_DOCS --> markers when present.
"""

import inspect
import sys
from pathlib import Path
from typing import get_type_hints

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ctransformers_tpu import LLM, AutoModelForCausalLM, Config  # noqa: E402
from ctransformers_tpu.llm import docs as config_docs  # noqa: E402


def config_table() -> str:
    out = [
        "### Config",
        "",
        "| Parameter | Type  | Description | Default |",
        "| :-------- | :---- | :---------- | :------ |",
    ]
    hints = get_type_hints(Config)
    for param, description in config_docs.items():
        if param not in hints:
            continue  # call-level kwarg (e.g. guidance_scale), not Config
        type_ = "List[str]" if param == "stop" else getattr(
            hints[param], "__name__", str(hints[param])
        )
        default = getattr(Config, param)
        out.append(f"| `{param}` | `{type_}` | {description} | `{default}` |")
    out.append("")
    out.append(
        "> **Note:** `context_length` is honored by LLaMA, Falcon, MPT and "
        "Replit models (clamped to the trained window where the format "
        "requires it)."
    )
    return "\n".join(out)


def method_md(cls, name: str, depth: int = 4) -> str:
    fn = getattr(cls, name)
    doc = inspect.getdoc(fn) or ""
    try:
        sig = inspect.signature(fn)
        params = ", ".join(
            p for p in str(sig)[1:-1].split(", ") if not p.startswith("self")
        )
    except (TypeError, ValueError):
        params = "..."
    head = "#" * depth
    return f"{head} `{cls.__name__}.{name}({params})`\n\n{doc}\n"


def class_md(cls, methods, depth: int = 3) -> str:
    head = "#" * depth
    doc = inspect.getdoc(cls) or ""
    out = [f"{head} Class `{cls.__name__}`\n", doc, ""]
    for m in methods:
        out.append(method_md(cls, m, depth + 1))
    return "\n".join(out)


def properties_table(cls) -> str:
    out = ["#### Properties", "", "| Property | Description |", "|---|---|"]
    for name, member in inspect.getmembers(cls):
        if isinstance(member, property) and member.fget.__doc__:
            out.append(f"| `{name}` | {inspect.getdoc(member.fget)} |")
    return "\n".join(out)


def main():
    parts = [
        "## API",
        "",
        config_table(),
        "",
        class_md(
            AutoModelForCausalLM, ["from_pretrained"], depth=3
        ),
        class_md(
            LLM,
            [
                "__init__",
                "tokenize",
                "detokenize",
                "is_eos_token",
                "eval",
                "sample",
                "generate",
                "__call__",
                "embed",
                "prepare_inputs_for_generation",
                "save_session",
                "load_session",
            ],
            depth=3,
        ),
        properties_table(LLM),
        "",
    ]
    api = "\n".join(parts)

    docs_dir = ROOT / "docs"
    docs_dir.mkdir(exist_ok=True)
    (docs_dir / "api.md").write_text(api)

    readme = ROOT / "README.md"
    marker = "<!-- API_DOCS -->"
    contents = readme.read_text()
    if contents.count(marker) == 2:
        head, _, tail = contents.split(marker)
        readme.write_text(head + marker + "\n" + api + "\n" + marker + tail)
        print("README.md API section updated")
    print(f"wrote {docs_dir / 'api.md'}")


if __name__ == "__main__":
    main()
