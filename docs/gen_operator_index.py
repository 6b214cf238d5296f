#!/usr/bin/env python
"""Regenerate docs/OPERATORS.md from the live registry."""
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from storm_netmonitor_spark import registry  # noqa: E402

registry.load_all()
rows = []
for name, fn in sorted(registry.QUERIES.items()):
    mod = fn.__module__.replace("storm_netmonitor_spark.", "")
    doc = (inspect.getdoc(fn) or "").split("\n")[0].rstrip(".")
    oracle = "hash" if name in registry.ORACLES else "rows+unit-test"
    rows.append(f"| `{name}` | {mod} | {oracle} | {doc} |")
out = [
    "# Operator index — generated from the registry",
    "",
    f"{len(rows)} operators; 'hash' = full DuckDB value-hash oracle,",
    "'rows+unit-test' = approximate/stubbed op with a semantic unit test.",
    "Regenerate with: `python docs/gen_operator_index.py`",
    "",
    "| operator | module | oracle | summary |",
    "|---|---|---|---|",
    *rows,
    "",
]
here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(here, "OPERATORS.md"), "w") as f:
    f.write("\n".join(out))
print(f"wrote OPERATORS.md ({len(rows)} operators)")
