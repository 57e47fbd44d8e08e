# SPDX-License-Identifier: CECILL-2.1
"""Line-overlap scan vs the reference: difflib matching-block line counts.

Usage: python docs/similarity_check.py [relpath ...]
Compares barc4dip_tpu/<relpath> against /root/reference/src/barc4dip/<relpath>
(defaults to every same-named pair) and prints identical-line counts and
ratios, the same signal the round-2 review used to flag derivative files.
"""
import difflib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1] / "barc4dip_tpu"
REF = Path("/root/reference/src/barc4dip")


def overlap(a: Path, b: Path):
    la = a.read_text().splitlines()
    lb = b.read_text().splitlines()
    sm = difflib.SequenceMatcher(None, la, lb, autojunk=False)
    matched = sum(bl.size for bl in sm.get_matching_blocks())
    # ignore trivial matches: blank lines and single-char lines
    nontrivial = 0
    for bl in sm.get_matching_blocks():
        for i in range(bl.a, bl.a + bl.size):
            if len(la[i].strip()) > 1:
                nontrivial += 1
    return matched, nontrivial, len(la)


def main(argv):
    if argv:
        pairs = [(REPO / p, REF / p) for p in argv]
    else:
        pairs = []
        for f in sorted(REPO.rglob("*.py")):
            rel = f.relative_to(REPO)
            ref = REF / rel
            if ref.exists():
                pairs.append((f, ref))
    rows = []
    for a, b in pairs:
        if not (a.exists() and b.exists()):
            print(f"skip {a} (missing pair)")
            continue
        m, nt, n = overlap(a, b)
        rows.append((nt / max(n, 1), m, nt, n, a.relative_to(REPO)))
    for ratio, m, nt, n, rel in sorted(rows, reverse=True):
        print(f"{ratio:6.1%}  nontrivial={nt:4d} matched={m:4d} / {n:4d}  {rel}")


if __name__ == "__main__":
    main(sys.argv[1:])
