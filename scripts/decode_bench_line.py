"""Decode bench.py's compact FINAL line back to {query: seconds}.

The driver captures only the last 2000 chars of bench output; once the
registry outgrew what a JSON dict of per-query times could carry in
that budget (round 11: 29 entries silently dropped), bench.py switched
the overflow stage to a PACKED STRING (r11 VERDICT ask #2):

    {"metric":"wall", ..., "qunit":"ds", "qfmt":"pack",
     "n_omitted":0, "queries":"<alias>:<ds> <alias>:<ds> ...", ...}

at ~7 chars/entry every registry query fits with ~35 entries of
headroom. This script inverts it — and the plain dict forms — using
bench.BENCH_KEY_ALIASES / REF_BENCH_KEYS.

Usage:
    python scripts/decode_bench_line.py BENCH_r12.json      # driver artifact
    python scripts/decode_bench_line.py '<raw json line>'   # pasted line
Prints one "name seconds" row per query, slowest first, then the wall.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_KEY_ALIASES  # noqa: E402

# invert to the names the verbose line / timings dict uses (the five
# Athena-path queries decode to their ref_* keys, same as verbose)
_ALIAS_TO_NAME = {v: k for k, v in BENCH_KEY_ALIASES.items()}


def decode(parsed: dict) -> dict[str, float]:
    """parsed = json.loads of the final bench line (any format stage)."""
    q = parsed.get("queries", {})
    scale = {"cs": 100.0, "ds": 10.0, "s": 1.0}[parsed.get("qunit", "s")]
    if isinstance(q, str):  # qfmt == "pack"
        pairs = (tok.rsplit(":", 1) for tok in q.split() if ":" in tok)
        q = {alias: int(v) for alias, v in pairs}
    return {
        _ALIAS_TO_NAME.get(alias, alias): val / scale
        for alias, val in q.items()
    }


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r12.json"
    if os.path.exists(arg):
        blob = json.load(open(arg))
        parsed = blob.get("parsed", blob)
    else:
        parsed = json.loads(arg)
    timings = decode(parsed)
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{name} {sec:.1f}")
    print(f"# wall {parsed.get('value')} sec over {len(timings)} queries"
          f" (n_omitted={parsed.get('n_omitted', 0)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
