#!/usr/bin/env python
"""Generate the runnable notebooks from the example scripts (the reference
ships Beginner_Example / Custom_Algorithm / Custom_Dataset .ipynb files —
notebooks/ here mirrors them; the .py examples stay the tested source of
truth and this script keeps the notebooks in sync)."""
from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAIRS = {
    "examples/beginner.py": "notebooks/Beginner_Example.ipynb",
    "examples/custom_algorithm.py": "notebooks/Custom_Algorithm.ipynb",
    "examples/custom_dataset.py": "notebooks/Custom_Dataset.ipynb",
}


def to_cells(src: str):
    """Split a script into a markdown header cell (the docstring) and code
    cells (top-level blocks separated by blank-line-delimited defs)."""
    lines = src.splitlines()
    cells = []
    # docstring -> markdown
    if '"""' in src:
        start = src.index('"""') + 3
        end = src.index('"""', start)
        doc = src[start:end].strip()
        cells.append({"cell_type": "markdown", "metadata": {},
                      "source": doc.splitlines(keepends=True)})
        body = src[end + 3:]
    else:
        body = src
    # drop the sys.path shim and the __main__ guard; inline main() body
    code_lines = []
    skip = False
    for ln in body.splitlines():
        if ln.startswith(("import os as _os", "import sys as _sys",
                          "_sys.path.insert")):
            continue
        if ln.startswith('if __name__'):
            skip = True
            continue
        if skip:
            continue
        code_lines.append(ln)
    code = "\n".join(code_lines).strip() + "\nmain()\n"
    cells.append({"cell_type": "code", "execution_count": None,
                  "metadata": {}, "outputs": [],
                  "source": code.splitlines(keepends=True)})
    return cells


def main():
    os.makedirs(os.path.join(REPO, "notebooks"), exist_ok=True)
    for py, nb in PAIRS.items():
        with open(os.path.join(REPO, py)) as f:
            src = f.read()
        notebook = {
            "cells": to_cells(src),
            "metadata": {"kernelspec": {"display_name": "Python 3",
                                        "language": "python",
                                        "name": "python3"},
                         "language_info": {"name": "python"}},
            "nbformat": 4, "nbformat_minor": 5,
        }
        out = os.path.join(REPO, nb)
        with open(out, "w") as f:
            json.dump(notebook, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
