"""Generate docs/API.md — a module-by-module index of the public API.

The reference ships a sphinx site (``/root/reference/docs/``); this repo
keeps a single generated markdown page instead, so it can never drift far
from the code: re-run ``python scripts/gen_api_md.py`` after adding public
surface (CI-friendly, no sphinx dependency).
"""

from __future__ import annotations

import ast
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "pytdscf_tpu")

SKIP_DIRS = {"__pycache__"}


def first_line(node) -> str:
    doc = ast.get_docstring(node) or ""
    line = doc.strip().splitlines()[0] if doc.strip() else ""
    return line


def walk_module(path: str) -> list[tuple[str, str, str]]:
    """[(kind, name, summary)] of public defs in one file."""
    tree = ast.parse(open(path).read())
    out = []
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            out.append(("class", node.name, first_line(node)))
            for sub in node.body:
                if isinstance(
                    sub, (ast.FunctionDef, ast.AsyncFunctionDef)
                ) and not sub.name.startswith("_"):
                    out.append(
                        ("method", f"{node.name}.{sub.name}", first_line(sub))
                    )
        elif isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef)
        ) and not node.name.startswith("_"):
            out.append(("def", node.name, first_line(node)))
    return out


def main() -> None:
    lines = [
        "# API reference (generated)",
        "",
        "One line per public symbol; regenerate with",
        "`python scripts/gen_api_md.py`.  Module docstrings carry the",
        "design notes and reference parity targets (file:line into",
        "`/root/reference`).",
        "",
    ]
    for root, dirs, files in sorted(os.walk(PKG)):
        dirs[:] = sorted(d for d in dirs if d not in SKIP_DIRS)
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, ROOT)
            mod = (
                os.path.relpath(path, os.path.dirname(PKG))[:-3]
                .replace(os.sep, ".")
                .removesuffix(".__init__")
            )
            tree = ast.parse(open(path).read())
            modline = first_line(tree)
            symbols = walk_module(path)
            if not symbols and not modline:
                continue
            lines.append(f"## `{mod}`")
            lines.append("")
            if modline:
                lines.append(f"{modline}  (`{rel}`)")
            else:
                lines.append(f"(`{rel}`)")
            lines.append("")
            for kind, name, summary in symbols:
                if kind == "method":
                    prefix = "    - "
                    shown = f"`{name.split('.', 1)[1]}`"
                else:
                    prefix = "- "
                    shown = f"**`{name}`**" if kind == "class" else f"`{name}()`"
                lines.append(
                    f"{prefix}{shown}{' — ' + summary if summary else ''}"
                )
            lines.append("")
    out = "\n".join(lines) + "\n"
    dest = os.path.join(ROOT, "docs", "API.md")
    with open(dest, "w") as fh:
        fh.write(out)
    print(f"wrote {dest} ({len(out.splitlines())} lines)", file=sys.stderr)


if __name__ == "__main__":
    main()
