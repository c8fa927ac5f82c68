#!/usr/bin/env python
"""Guardrail for the optimization round: oracle_sql() text must stay
byte-identical to the round-start fingerprints (the driver hashes it;
any drift is graded as a regression). Run after every change."""
import hashlib, json, os, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import __spark_entry__ as e  # noqa: E402

ref = json.load(open(os.path.join(REPO, "scripts", "oracle_fp_round_start.json")))
cur = {k: hashlib.md5(v.encode()).hexdigest() for k, v in e.oracle_sql().items()}
bad = []
for k, h in ref["fp"].items():
    if k not in cur:
        bad.append(f"MISSING oracle: {k}")
    elif cur[k] != h:
        bad.append(f"CHANGED oracle: {k}")
missing_q = set(ref["fp"]) - set(e.queries())
for k in sorted(missing_q):
    bad.append(f"MISSING query: {k}")
if bad:
    print("\n".join(bad))
    sys.exit(1)
print(f"OK: {len(cur)} oracles match round-start fingerprints; "
      f"{len(e.queries())} queries present")
