"""Guard against silent shadowing: a module that defines the same
top-level name twice keeps only the LAST definition, and every existing
import site silently changes behavior. This happened live in round 7 —
a second ``mutual_information`` landed in operators/aggregates.py and
would have changed q_mutual_info's semantics without any test failing
at the point of definition. AST-level, so it catches def/class/assign
collisions even when the code imports fine.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(__file__)), "python_mapreduce_spark")


def _top_level_names(tree: ast.Module):
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            yield node.name, node.lineno


def test_no_module_defines_a_top_level_name_twice():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path, encoding="utf-8") as fh:
                tree = ast.parse(fh.read(), filename=path)
            seen: dict[str, int] = {}
            for name, lineno in _top_level_names(tree):
                if name in seen:
                    offenders.append(
                        f"{os.path.relpath(path, PKG)}: {name!r} defined at "
                        f"lines {seen[name]} and {lineno}"
                    )
                else:
                    seen[name] = lineno
    assert not offenders, "shadowed top-level definitions:\n" + "\n".join(offenders)
