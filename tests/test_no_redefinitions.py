"""Guard against silently-shadowed duplicate function definitions (F811).

Round-4 advice: a duplicated ``def test_...`` name in a test module shadows
the earlier definition and pytest runs only the last one — assertions vanish
without any failure. The container ships no flake8, so this is a minimal
AST-level F811 for every test module and every package module.
"""

import ast
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN_DIRS = ("tests", "recommendation_system_big_data_spark", "tools")


def _duplicate_toplevel_defs(path):
    tree = ast.parse(open(path).read(), filename=path)
    seen, dups = {}, []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                dups.append((node.name, seen[node.name], node.lineno))
            seen[node.name] = node.lineno
    return dups


def test_no_duplicate_toplevel_definitions():
    problems = []
    for d in SCAN_DIRS:
        for dirpath, _, files in os.walk(os.path.join(ROOT, d)):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                p = os.path.join(dirpath, fn)
                for name, first, second in _duplicate_toplevel_defs(p):
                    rel = os.path.relpath(p, ROOT)
                    problems.append(f"{rel}:{second} redefines {name} (first at :{first})")
    assert not problems, "\n".join(problems)
