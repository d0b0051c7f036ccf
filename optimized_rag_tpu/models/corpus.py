"""Label-free training corpora harvested from the local machine.

The reference trains nothing (it rents OpenAI embeddings), so it needs no
data; our encoders pretrain self-supervised (models/pretrain.py) and want
real English prose. With zero network egress, the richest local source is
the documentation embedded in installed Python packages: module, class,
and function docstrings across numpy/jax/flax/torch/etc. are tens of
thousands of paragraphs of grammatical technical English.

Harvesting parses source files with ``ast`` — nothing is imported, so
arbitrary package init side effects can't run and broken modules can't
break the harvest.
"""

from __future__ import annotations

import ast
import os
import re
from typing import Iterable, List, Optional

_WS = re.compile(r"[ \t]+")
_DEFAULT_PACKAGES = (
    "numpy", "jax", "jaxlib", "flax", "optax", "chex", "orbax",
    "torch", "transformers", "pandas", "scipy",
)


def _clean(doc: str) -> str:
    """Normalize whitespace; drop doctest/signature noise lines."""
    lines = []
    for ln in doc.splitlines():
        ln = _WS.sub(" ", ln.strip())
        if ln.startswith((">>>", "...", "---", "===")):
            continue
        lines.append(ln)
    return "\n".join(lines).strip()


def _iter_docstrings(path: str) -> Iterable[str]:
    try:
        with open(path, encoding="utf-8", errors="ignore") as f:
            tree = ast.parse(f.read())
    except (SyntaxError, ValueError, OSError):
        return
    nodes = [tree] + [n for n in ast.walk(tree)
                      if isinstance(n, (ast.FunctionDef,
                                        ast.AsyncFunctionDef, ast.ClassDef))]
    for node in nodes:
        doc = ast.get_docstring(node)
        if doc:
            yield doc


def harvest_docstrings(packages: Optional[Iterable[str]] = None,
                       min_chars: int = 200, max_chars: int = 1200,
                       max_files_per_pkg: int = 400,
                       max_chunks: int = 30000,
                       seed: int = 0) -> List[str]:
    """Collect docstring paragraphs from installed packages as text chunks.

    Docstrings longer than ``max_chars`` are split on blank lines and
    re-packed greedily; fragments under ``min_chars`` are dropped (they
    are mostly one-line summaries with little syntax to learn from).
    Deterministic for a fixed environment + seed.
    """
    import numpy as np
    roots = []
    for pkg in (packages or _DEFAULT_PACKAGES):
        try:
            mod = __import__(pkg)
        except Exception:
            continue
        path = getattr(mod, "__file__", None)
        if path:
            roots.append(os.path.dirname(path))
    chunks: List[str] = []
    seen = set()
    for root in roots:
        files = []
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in sorted(dirnames)
                           if d not in ("tests", "test", "__pycache__")]
            files.extend(os.path.join(dirpath, f)
                         for f in sorted(filenames) if f.endswith(".py"))
        for path in files[:max_files_per_pkg]:
            for doc in _iter_docstrings(path):
                doc = _clean(doc)
                if len(doc) < min_chars:
                    continue
                # Greedy re-pack of paragraphs into <= max_chars chunks.
                cur: List[str] = []
                cur_len = 0
                for para in doc.split("\n\n"):
                    if cur_len + len(para) > max_chars and cur:
                        chunks.append("\n\n".join(cur))
                        cur, cur_len = [], 0
                    cur.append(para)
                    cur_len += len(para) + 2
                if cur and cur_len >= min_chars:
                    chunks.append("\n\n".join(cur))
            if len(chunks) >= 4 * max_chunks:
                break
    # Dedup (identical docstrings repeat across re-exports) and subsample
    # deterministically to max_chunks.
    unique = []
    for c in chunks:
        key = hash(c)
        if key not in seen:
            seen.add(key)
            unique.append(c)
    if len(unique) > max_chunks:
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(unique), max_chunks, replace=False)
        unique = [unique[i] for i in sorted(idx)]
    return unique
