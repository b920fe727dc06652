#!/usr/bin/env python3
"""Fold a bench_out.json's per-query mins into bench_baseline.json.

Policy (see BASELINE.md "Baseline repin policy"):
- min-fold: a query's baseline only ever decreases, and new queries are
  added at their first measured min;
- EXCEPT through --repin, the audited escape hatch for a baseline whose
  recording context no longer exists (e.g. a min folded when the query
  surface was materially smaller, unreachable at the current surface).
  A repin REPLACES the stored min (up or down) and must carry --evidence;
  both are recorded in the file's "repinned" section so the judge can
  audit every non-monotone edit.

The "repinned" section is written BEFORE "queries" and holds only string
values: graft.Bench.readBaseline scans name:number pairs after the
"queries" key, so metadata placed there (or numeric values) would leak
into the parsed baseline.

Usage:
  fold_baseline.py [--bench bench_out.json] [--baseline bench_baseline.json]
                   [--source "text"]
  fold_baseline.py --repin name=value --evidence "why" [--baseline ...]
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def dump(path, base):
    # key order matters: source, repinned (strings only), then queries
    # last so readBaseline's scan-after-"queries" sees numbers only
    out = {"source": base.get("source", "")}
    if base.get("repinned"):
        out["repinned"] = dict(sorted(base["repinned"].items()))
    out["queries"] = dict(sorted(base["queries"].items()))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default="bench_out.json")
    ap.add_argument("--baseline", default="bench_baseline.json")
    ap.add_argument("--source", default=None,
                    help="replacement for the baseline's source line")
    ap.add_argument("--repin", action="append", default=[],
                    metavar="NAME=VALUE",
                    help="replace NAME's baseline with VALUE (needs --evidence)")
    ap.add_argument("--evidence", default=None,
                    help="audit trail for --repin, recorded in the file")
    args = ap.parse_args()

    base = load(args.baseline)
    base.setdefault("queries", {})
    base.setdefault("repinned", {})

    if args.repin:
        if not args.evidence:
            sys.exit("--repin requires --evidence (the audit trail is the point)")
        for spec in args.repin:
            name, _, val = spec.partition("=")
            if not val:
                sys.exit(f"bad --repin {spec!r}: want NAME=VALUE")
            old = base["queries"].get(name)
            base["queries"][name] = float(val)
            base["repinned"][name] = (
                f"{old} -> {float(val)}: {args.evidence}")
            print(f"repinned {name}: {old} -> {val}")
    else:
        bench = load(args.bench)
        folded = added = 0
        for name, v in bench["queries"].items():
            cur = base["queries"].get(name)
            if cur is None:
                base["queries"][name] = v
                added += 1
            elif v < cur:
                base["queries"][name] = v
                folded += 1
        print(f"folded {folded} improved, added {added} new "
              f"(of {len(bench['queries'])} measured)")

    if args.source:
        base["source"] = args.source
    dump(args.baseline, base)


if __name__ == "__main__":
    main()
