"""Derive the driver-gate staleness ledger (VERDICT r09 item 4).

Parses every committed CORRECTNESS_r*.json, computes each queries() entry's
last driver-green round, and writes STALENESS.md — the committed ledger that
replaces the mathematically-dead "every entry within two rounds" claim (at
214 entries a 50-entry cap is a ceil(214/50) = 5-round rotation, worst
case). tests/test_entry_rotation.py re-derives the same ledger and asserts
the queries() post-cap ordering IS the oldest-first queue, so the bound
holds by construction round over round.

Usage: python scripts/staleness_ledger.py [--check]
  --check: exit 1 if STALENESS.md is out of date instead of rewriting it.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Entries whose DRIVER HISTORY contains rows-only records (err: no_oracle).
# The ledger must keep counting those PAST records as green even after an
# entry gains a full SQL oracle (quality_model got one in r13 — the
# closed-form centroid distillation), or its last-green round would
# silently rewind and reorder the rotation queue.
ROWS_ONLY = {"sim_ivfpq_residual", "quality_model"}


def _tracked_artifacts() -> "list[str]":
    """Git-TRACKED CORRECTNESS_r*.json only (VERDICT r10 item 1): the driver
    drops each round's artifact AFTER the builder's final commit, so an
    untracked artifact must not change the derivation mid-round — otherwise
    the committed STALENESS.md and the cap-order assertion go red at every
    round boundary by construction. The builder commits the new artifact and
    re-runs this script as the FIRST act of the next round. Falls back to a
    plain glob when git is unavailable (e.g. an exported tree)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", REPO, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        if out:
            return sorted(os.path.join(REPO, f) for f in out)
    except Exception:
        pass
    return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def last_green_rounds() -> "dict[str, int]":
    """entry -> highest round with a driver-green row. Green means
    rows+schema+hash all matched with no error; for the documented
    rows-only entries (no SQL oracle by design) a recorded spark_rows
    counts — that IS the driver's weaker check for them."""
    last: dict[str, int] = {}
    for f in _tracked_artifacts():
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name, rec in json.load(open(f)).items():
            if not isinstance(rec, dict):
                continue
            if name in ROWS_ONLY:
                green = rec.get("spark_rows") is not None
            else:
                green = bool(
                    rec.get("rows_match")
                    and rec.get("schema_match")
                    and rec.get("hash_match")
                    and not rec.get("err")
                )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def render() -> str:
    import __spark_entry__ as entry_mod

    qs = list(entry_mod.queries())
    last = last_green_rounds()
    cur = max(last.values())
    by_round: dict[int | None, list[str]] = {}
    for q in qs:
        by_round.setdefault(last.get(q), []).append(q)
    lines = [
        "# STALENESS — driver-gate ledger",
        "",
        f"Derived from CORRECTNESS_r01..r{cur:02d}.json by "
        "`scripts/staleness_ledger.py` (re-run it after each driver round; "
        "`tests/test_entry_rotation.py` asserts this file matches the "
        "derivation AND that queries()' post-cap order is the oldest-first "
        "queue).",
        "",
        f"Entries: {len(qs)}; gate cap: 50/round; worst-case re-gate "
        f"latency under the oldest-first queue: ceil({len(qs)}/50) = "
        f"{-(-len(qs) // 50)} rounds.",
        "",
        "| last driver-green | entries | names |",
        "|---|---|---|",
    ]
    for rnd in sorted(by_round, key=lambda r: (r is None, r)):
        names = by_round[rnd]
        tag = (f"r{rnd:02d}" if rnd
               else "never (new borns; evidence = local all-entry oracle run)")
        lines.append(f"| {tag} | {len(names)} | {', '.join(sorted(names))} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    path = os.path.join(REPO, "STALENESS.md")
    text = render()
    if "--check" in sys.argv:
        on_disk = open(path).read() if os.path.exists(path) else ""
        if on_disk != text:
            print("STALENESS.md is stale — re-run scripts/staleness_ledger.py")
            sys.exit(1)
        print("STALENESS.md up to date")
    else:
        open(path, "w").write(text)
        print(f"wrote {path}")
