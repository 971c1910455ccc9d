#!/usr/bin/env python3
"""Diff two plan-census artifacts (PLANS_r{N}.json, written by
`graft.ExplainQ -json`): flag every query whose exchange count grew, whose
whole-stage-codegen span count shrank, or whose broadcast-join count
shrank — the three plan-shape regressions worth a human look (a new
shuffle, a codegen break, a lost broadcast). Additions/removals of whole
queries are listed too.

Usage: scripts/plans_diff.py PLANS_r15.json PLANS_r16.json
Exit 0 when nothing regressed, 1 otherwise (same contract as check.py);
2 on usage/input errors (missing or malformed census file) so a scripted
caller can tell "no report" from "real regression".
"""
import json, sys


def load(path):
    # A missing/corrupt census must not exit 1: that code is reserved
    # for genuine plan regressions (ADVICE r15).
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"ERROR: cannot read census {path}: {e}")
        sys.exit(2)


def main():
    if len(sys.argv) != 3:
        print(__doc__.strip())
        sys.exit(2)
    old = load(sys.argv[1])
    new = load(sys.argv[2])
    bad = 0
    for name in sorted(set(old) - set(new)):
        print(f"REMOVED {name} (was {old[name]})")
        bad += 1
    for name in sorted(set(new) - set(old)):
        print(f"ADDED   {name} {new[name]} (no baseline — eyeball once)")
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        msgs = []
        # ExplainQ writes {"err":true} for a query that failed to plan;
        # such entries carry no ex/wscg/bhj keys (ADVICE r15). A query
        # erring in BOTH censuses is a known pre-existing failure, not a
        # regression — flagging it would fail every future close with a
        # misleading "no longer plans" (ADVICE r16).
        if "err" in n and "err" in o:
            print(f"NOTE    {name}: still fails to plan (err in both "
                  "censuses), unchanged")
            continue
        if "err" in n:
            print(f"REGRESS {name}: query no longer plans (err in new census)")
            bad += 1
            continue
        if "err" in o:
            print(f"NOTE    {name}: err in old census, plans now "
                  f"{n} — no baseline counts to compare")
            continue
        # AQE exchange-reuse race: two identical subtrees submitted
        # concurrently can both materialize before either is cached, so
        # one run's executed plan prints the duplicate subtree (MORE
        # exchanges + codegen spans + sometimes broadcast joins) and
        # another's prints a ReusedExchange (fewer). Observed: q89
        # flickers 19/11 <-> 21/13 solo on identical code. A shrink of
        # wscg/bhj ACCOMPANIED by an exchange shrink is this dedup
        # signature, not a regression: a real codegen break does not
        # remove exchanges, and a real broadcast loss ADDS them
        # (SMJ shuffles both sides). The shrink a dedup explains is
        # BOUNDED by the removed subtree, which removed ex_drop
        # exchanges — a wscg/bhj loss beyond that bound is a real
        # regression hiding behind a race-inflated baseline and stays
        # flagged.
        ex_drop = max(0, o["ex"] - n["ex"])
        dedup_wscg = ex_drop and (o["wscg"] - n["wscg"]) <= ex_drop
        dedup_bhj = ex_drop and (o["bhj"] - n["bhj"]) <= ex_drop
        if n["ex"] > o["ex"]:
            msgs.append(f"exchanges {o['ex']} -> {n['ex']}")
        if n["wscg"] < o["wscg"] and not dedup_wscg:
            msgs.append(f"codegen spans {o['wscg']} -> {n['wscg']}")
        if n["bhj"] < o["bhj"] and not dedup_bhj:
            msgs.append(f"broadcast joins {o['bhj']} -> {n['bhj']}")
        dedup = ex_drop > 0
        if msgs:
            print(f"REGRESS {name}: {'; '.join(msgs)}")
            bad += 1
        elif dedup and (n["wscg"] < o["wscg"] or n["bhj"] < o["bhj"]):
            print(f"NOTE    {name}: plan got smaller with exchanges "
                  f"({o['ex']} -> {n['ex']}, wscg {o['wscg']} -> "
                  f"{n['wscg']}, bhj {o['bhj']} -> {n['bhj']}) — "
                  "exchange-reuse dedup, baseline was race-inflated")
    if not bad:
        print(f"OK: {len(set(old) & set(new))} shared plans, "
              "no exchange growth, no codegen/broadcast loss")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
