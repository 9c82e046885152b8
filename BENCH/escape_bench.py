"""Entity escape / unescape throughput — port of the reference's
Benchmarker entity scenarios (/root/reference/Utilities/Benchmarker.m:64-75:
escape + unescape of the 7 MB html5.html fixture, 1 rep each).

The reference's fixture is a missing large blob in this checkout
(.MISSING_LARGE_BLOBS), so we synthesize a deterministic ~7 MB
entity-dense document of equivalent shape: markup chars, named + numeric
references, and plain prose in realistic proportions.

Usage: python BENCH/escape_bench.py [reps]   (reports best-of-reps)
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkhtml.escape import escape_html, unescape_html

WORDS = (
    "the quick brown fox jumps over a lazy dog while 10 < 20 && x > 'y' "
    '"quoted" text &amp; more &lt;tags&gt; &#65; &notin; &copy; plain prose '
).split()


def make_fixture(target_mb: float = 7.0, seed: int = 42) -> str:
    rng = random.Random(seed)
    out = []
    size = 0
    target = int(target_mb * 1024 * 1024)
    while size < target:
        w = rng.choice(WORDS)
        out.append(w)
        size += len(w) + 1
    return " ".join(out)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    doc = make_fixture()
    mb = len(doc) / 1e6
    esc_best = unesc_best = float("inf")
    escaped = escape_html(doc)
    for _ in range(reps):
        t = time.perf_counter()
        escape_html(doc)
        esc_best = min(esc_best, time.perf_counter() - t)
        t = time.perf_counter()
        unescape_html(escaped)
        unesc_best = min(unesc_best, time.perf_counter() - t)
    print(
        f"fixture {mb:.1f} MB | escape {esc_best:.3f}s "
        f"({mb / esc_best:.1f} MB/s) | unescape {unesc_best:.3f}s "
        f"({mb / unesc_best:.1f} MB/s) | best of {reps}"
    )


if __name__ == "__main__":
    main()
