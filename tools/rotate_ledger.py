"""Rotate DRIVER_ORDER after a driver round — the ledger maintenance
step VERDICT r9 item 1 exists because someone forgot.

The driver certifies the FIRST 50 ids of DRIVER_ORDER each round. Once
CORRECTNESS_r{N}.json lands, the consumed window must move behind the
remaining never-checked ids, or the next round's window re-certifies
the same 50 and provenance advances by zero (the r9→r10 incident).

This tool:
  1. reads the newest CORRECTNESS_r*.json;
  2. verifies its ids are exactly the current DRIVER_ORDER head (the
     window actually ran as committed) and reports any non-green rows
     (greens rotate out; failed ids STAY at the head for re-check);
  3. rewrites registry.py's DRIVER_ORDER with the consumed green ids
     appended to the refresh tail (annotated with their round) and
     everything else shifted up.

Usage:
    python tools/rotate_ledger.py            # dry run (prints the plan)
    python tools/rotate_ledger.py --apply    # rewrite registry.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "nchu_bigdata_spark", "registry.py")
WINDOW = 50


def newest_correctness() -> tuple[int, dict]:
    best = None
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, p)
    if best is None:
        raise SystemExit("no CORRECTNESS_r*.json found")
    with open(best[1], encoding="utf-8") as f:
        return best[0], json.load(f)


def is_green(row: dict, name: str | None = None) -> bool:
    if (
        name is not None
        and row.get("err") == "no_oracle"
        and (row.get("spark_rows") or 0) > 0
    ):
        # Rows-only-by-design ids (registry oracle is None, e.g.
        # text_compression_ratio's DEFLATE replay) get err='no_oracle'
        # from the driver by construction — the strongest row they can
        # ever earn. Pinning them at the head would burn one window
        # slot every round forever; rotate them out like a green.
        from nchu_bigdata_spark.registry import ordered_specs

        spec = ordered_specs().get(name)
        if spec is not None and spec.oracle is None:
            return True
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and (row.get("hash_match") or row.get("hash_match") is None)
        and not row.get("err")
    )


def main() -> int:
    apply = "--apply" in sys.argv[1:]
    rnd, rows = newest_correctness()
    from nchu_bigdata_spark.registry import DRIVER_ORDER

    head = DRIVER_ORDER[:WINDOW]
    window_ids = set(rows)
    head_set = set(head)
    if window_ids != head_set:
        missing = sorted(head_set - window_ids)
        extra = sorted(window_ids - head_set)
        print(
            f"CORRECTNESS_r{rnd} is NOT the committed head window — "
            "the ledger was already rotated for this round, or the "
            "driver ran a different registry revision. No action."
        )
        if missing:
            print("  in head but unchecked:", ", ".join(missing[:8]), "…")
        if extra:
            print("  checked but not in head:", ", ".join(extra[:8]), "…")
        return 1
    green = [n for n in head if is_green(rows[n], n)]
    stuck = [n for n in head if n not in green]
    print(f"CORRECTNESS_r{rnd}: {len(green)} green, {len(stuck)} not green")
    if stuck:
        print("  kept at head for re-check:", ", ".join(stuck))
    new_order = (
        stuck
        + [n for n in DRIVER_ORDER[WINDOW:]]
        + green  # greens go to the very tail (freshest certification)
    )
    assert len(new_order) == len(DRIVER_ORDER)
    print(f"next window head: {new_order[:5]} …")
    if not apply:
        print("(dry run — pass --apply to rewrite registry.py)")
        return 0
    with open(REGISTRY, encoding="utf-8") as f:
        src = f.read()
    m = re.search(r"DRIVER_ORDER = \[.*?\n\]", src, re.S)
    if m is None:
        raise SystemExit(
            "DRIVER_ORDER block not found in registry.py — the list was "
            "reformatted; restore the `DRIVER_ORDER = [...]` literal "
            "before rotating (ADVICE r10: previously an AttributeError)."
        )
    # Preserve the per-id certification-round annotations (`# r5`,
    # `# r9 green`, ...) already in the source: the refresh queue is
    # ordered oldest-certification-first, and blowing the tags away on
    # every rotation (the pre-r11 behavior) destroyed that provenance.
    old_tags: dict[str, str] = {}
    for line in m.group(0).splitlines():
        lm = re.match(r'\s*"([^"]+)",\s*(#.*)?$', line)
        if lm and lm.group(2):
            old_tags[lm.group(1)] = lm.group(2).strip()
    lines = ["DRIVER_ORDER = ["]
    lines.append(
        f"    # rotated by tools/rotate_ledger.py after round {rnd}: "
        f"{len(green)} green ids moved to the tail"
    )
    for i, n in enumerate(new_order):
        if i == 0:
            lines.append(
                f"    # -- ROTATION LEDGER window r{rnd + 1}: first "
                f"{WINDOW} ids below (stuck ids from r{rnd} lead) --"
            )
        elif i == WINDOW:
            lines.append(
                f"    # -- ids beyond the r{rnd + 1} window: consumed "
                f"head-first, {WINDOW}/round --"
            )
        if n in green:
            tag = f"  # r{rnd}"  # freshest certification round
        else:
            tag = f"  {old_tags[n]}" if n in old_tags else ""
        lines.append(f'    "{n}",{tag}')
    lines.append("]")
    src = src[: m.start()] + "\n".join(lines) + src[m.end() :]
    with open(REGISTRY, "w", encoding="utf-8") as f:
        f.write(src)
    print("registry.py rewritten — run the registry tests + a gate")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
