"""Regenerate ``pydatalake_spark/queries/freshness.py`` from the committed
driver artifacts — run at the START of each round, before rotating
``_GATE_FRONT``:

    python tools/gen_freshness.py 10        # 10 = the new CURRENT_ROUND

LAST_GREEN maps every query to the newest round whose
``CORRECTNESS_r{NN}.json`` shows it green (rows+schema match, no err).
``queries/__init__.py`` asserts at import that every registry query is
either in the current front or green within MAX_STALE_ROUNDS — so after
regenerating, any query this command ages past the window MUST be added
to the new front or the import fails loudly (the r7 silent-skip class
this ledger exists to prevent).
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", Path(f).name).group(1))
        for q, v in json.load(open(f)).items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and not v.get("err")
            )
            if ok:
                last[q] = max(last.get(q, 0), rnd)
    return last


def main() -> None:
    current_round = int(sys.argv[1])
    lg = last_green()
    newest = max(
        int(re.search(r"r(\d+)", Path(f).name).group(1))
        for f in glob.glob(str(ROOT / "CORRECTNESS_r*.json"))
    )
    body = "\n".join(f'    "{q}": {lg[q]},' for q in sorted(lg))
    src = f'''"""Driver-gate freshness ledger (r8 VERDICT item 6).

``LAST_GREEN`` maps every registry query to the newest round whose
driver-run ``CORRECTNESS_r{{NN}}.json`` shows it green (rows+schema match,
no err). Regenerate each round with::

    python tools/gen_freshness.py <new CURRENT_ROUND>

``queries/__init__.py`` asserts at import that every registry query either
sits in the current round's ``_GATE_FRONT`` (about to be re-gated) or has
a green driver row no older than ``CURRENT_ROUND - MAX_STALE_ROUNDS`` —
the invariant that keeps gate rotation from silently skipping a query
whose semantics changed (it bit twice: r7's front missed the
bigram_perplexity/token_pmi/rp_distortion redefinitions, leaving their
hard signal at r05 under the OLD semantics until r9 re-fronted them).
"""

# round whose gate the current _GATE_FRONT is built for
CURRENT_ROUND = {current_round}
# a green row may be at most this many rounds old before it must re-front
MAX_STALE_ROUNDS = 3

# state after CORRECTNESS_r{newest:02d}.json
LAST_GREEN = {{
{body}
}}
'''
    out = ROOT / "pydatalake_spark" / "queries" / "freshness.py"
    out.write_text(src)
    stale = sorted(q for q, r in lg.items() if r < current_round - 3)
    print(
        f"wrote {out} (CURRENT_ROUND={current_round}, "
        f"{len(lg)} queries, newest artifact r{newest:02d})"
    )
    print(
        f"{len(stale)} queries older than round {current_round - 3} "
        f"must be in _GATE_FRONT: {stale}"
    )


if __name__ == "__main__":
    main()
