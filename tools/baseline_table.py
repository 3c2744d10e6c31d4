#!/usr/bin/env python3
"""Render BASELINE.md's measured table from a Bench JSON line.

Usage: python3 tools/baseline_table.py BENCH_rNN.json [notes.json]
       python3 tools/baseline_table.py --correctness CORRECTNESS_rNN.json

The driver's BENCH_r{N}.json wraps the line under "tail"/"parsed"; a raw
Bench stdout line works too. Optional notes.json maps query -> note cell.
Prints the markdown table to stdout; paste (or redirect) into BASELINE.md
so the doc can never drift from the artifact.

--correctness mode prints the one-line correctness summary FROM THE DRIVER
ARTIFACT (hash-match counts + named failures), so BASELINE.md quotes the
hard signal rather than the builder's local gate.
"""
import json
import re
import sys


def load_bench(path):
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict):  # driver wrapper: parsed, or the line inside tail
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return d["parsed"]
        m = re.search(r'\{"metric":.*?"sf":"[^"]*"\}', d.get("tail", ""))
        if m:
            return json.loads(m.group(0))
    m = re.search(r'\{"metric":.*?"sf":"[^"]*"\}', text)
    if not m:
        raise SystemExit(f"no bench JSON line found in {path}")
    return json.loads(m.group(0))


def correctness_line(path):
    d = json.load(open(path))
    rows = {k: v for k, v in d.items() if isinstance(v, dict)}
    oracled = {k: v for k, v in rows.items() if v.get("err") != "no_oracle"}
    passed = [k for k, v in oracled.items() if v.get("hash_match") is True]
    failed = sorted(k for k, v in oracled.items() if v.get("hash_match") is not True)
    rnd = re.search(r"_r(\d+)", path)
    line = (f"Correctness per driver artifact {path.split('/')[-1]}: "
            f"{len(passed)}/{len(oracled)} oracle-testable queries hash-match "
            f"DuckDB ({len(rows)} declared, "
            f"{len(rows) - len(oracled)} no-oracle by design)")
    if failed:
        line += f"; failing: {', '.join(failed)}"
    print(line + ".")


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    if sys.argv[1] == "--correctness":
        return correctness_line(sys.argv[2])
    bench = load_bench(sys.argv[1])
    notes = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else {}
    qs, spread = bench["queries"], bench.get("spread", {})
    print("| query | median sec | spread | note |")
    print("|---|---|---|---|")
    for name in sorted(qs, key=lambda k: -qs[k]):
        print(f"| {name} | {qs[name]:.2f} | {spread.get(name, float('nan')):.2f} "
              f"| {notes.get(name, '')} |")
    total = sum(qs.values())
    print(f"| **total** | **{total:.1f}** | | "
          f"{len(qs)} headline queries, sum of medians |")


if __name__ == "__main__":
    main()
