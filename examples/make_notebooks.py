# SPDX-License-Identifier: CECILL-2.1
"""Render the example scripts as Jupyter notebooks (examples/notebooks/).

The reference ships its examples as notebooks (/root/reference/examples/
*.ipynb); this package keeps the canonical walkthroughs as smoke-tested
.py scripts and derives the notebook form from them, so the two can never
drift apart. Each notebook gets the script's docstring as a markdown
header, the script body (minus the __main__ guard) as a code cell, and a
final cell that runs the example with plots written next to the notebook.

Usage:
    python examples/make_notebooks.py            # write the .ipynb files
    python examples/make_notebooks.py --execute  # also run them (FAST mode)
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

import nbformat as nbf

HERE = Path(__file__).resolve().parent
OUT = HERE / "notebooks"


def _is_file_path_insert(node: ast.stmt) -> bool:
    """True for the scripts' ``sys.path.insert(0, ...__file__...)`` line —
    ``__file__`` does not exist in a notebook kernel, so the generator
    replaces it with a cwd-based equivalent."""
    return (
        isinstance(node, ast.Expr)
        and isinstance(node.value, ast.Call)
        and "__file__" in ast.unparse(node.value)
        and "sys.path" in ast.unparse(node.value)
    )


def _split_script(source: str) -> tuple[str, str, bool]:
    """(docstring, body-without-main-guard, main_takes_out_dir)."""
    tree = ast.parse(source)
    doc = ast.get_docstring(tree) or ""
    lines = source.splitlines()
    keep: list[str] = []
    takes_out_dir = False
    for node in tree.body:
        if (
            isinstance(node, ast.If)
            and isinstance(node.test, ast.Compare)
            and isinstance(node.test.left, ast.Name)
            and node.test.left.id == "__name__"
        ):
            continue  # the CLI guard becomes the notebook's final cell
        if (
            isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
            and node is tree.body[0]
        ):
            continue  # module docstring -> markdown cell
        if _is_file_path_insert(node):
            continue  # replaced by the kernel-safe setup cell
        if isinstance(node, ast.FunctionDef) and node.name == "main":
            takes_out_dir = bool(node.args.args)
        keep.extend(lines[node.lineno - 1 : node.end_lineno])
        keep.append("")
    return doc, "\n".join(keep).strip() + "\n", takes_out_dir


_SETUP_CELL = '''\
# make the repo importable from wherever this notebook is opened
import os
import sys
from pathlib import Path

root = Path(os.environ.get("BARC4DIP_TPU_ROOT", Path.cwd()))
while not (root / "barc4dip_tpu").is_dir() and root != root.parent:
    root = root.parent
sys.path.insert(0, str(root))
'''


def build_notebook(script: Path) -> nbf.NotebookNode:
    doc, body, takes_out_dir = _split_script(script.read_text())
    title = script.stem
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    if takes_out_dir:
        run_cell = (
            f'out_dir = "{title}_output"\n'
            "import os\n"
            "os.makedirs(out_dir, exist_ok=True)\n"
            "main(out_dir)\n"
        )
    else:
        run_cell = "main()\n"
    nb.cells = [
        nbf.v4.new_markdown_cell(f"# {title}\n\n{doc}"),
        nbf.v4.new_code_cell(_SETUP_CELL),
        nbf.v4.new_code_cell(body),
        nbf.v4.new_code_cell(run_cell),
    ]
    return nb


def main(argv: list[str]) -> int:
    execute = "--execute" in argv
    OUT.mkdir(exist_ok=True)
    scripts = sorted(HERE.glob("ex_*.py"))
    for script in scripts:
        nb = build_notebook(script)
        dest = OUT / f"{script.stem}.ipynb"
        if execute:
            import os

            from nbclient import NotebookClient

            os.environ["BARC4DIP_EX_FAST"] = "1"
            client = NotebookClient(
                nb, timeout=900, resources={"metadata": {"path": str(OUT)}}
            )
            client.execute()
        nbf.write(nb, dest)
        print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
