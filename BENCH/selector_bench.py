"""CSS selector benchmark — port of the reference's Benchmarker selector
scenario (/root/reference/Utilities/Benchmarker.m:45-62): the WebKit
QuerySelector.html perf suite, suites weighted by ``fraction``, mean over
reps.

Fixture data (HTML document + selector plist) is read from the reference
checkout at runtime (public test data; nothing is copied into this repo).
Falls back to a synthesized equivalent when the reference isn't present.

Usage: python BENCH/selector_bench.py [reps]
"""

from __future__ import annotations

import os
import plistlib
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkhtml.dom import FlatDOM
from sparkhtml.selector import CompiledSelector, SelectorError

REF = "/root/reference/Utilities/Fixtures"


def load_fixture():
    html_path = os.path.join(REF, "query-selector.html")
    plist_path = os.path.join(REF, "query-selector.plist")
    if os.path.exists(html_path) and os.path.exists(plist_path):
        html = open(html_path, encoding="utf-8", errors="replace").read()
        with open(plist_path, "rb") as f:
            suites = plistlib.load(f)
        return html, suites
    # synthesized fallback with the same shape
    html = "<div id=root>" + "".join(
        f"<ul class='c{i % 7}'><li id=i{i} data-bar=x>t</li></ul>"
        for i in range(500)
    ) + "</div>"
    suites = [
        {"fraction": 1, "selectors": ["li[data-bar]", ".c3 li", "#i42",
                                      "ul > li", "div li"]}
    ]
    return html, suites


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    html, suites = load_fixture()
    dom = FlatDOM.from_html(html)
    print(f"document: {len(dom)} nodes; {len(suites)} suites")

    compiled = []
    skipped = 0
    for suite in suites:
        sels = []
        for s in suite["selectors"]:
            try:
                sels.append(CompiledSelector(s))
            except SelectorError:
                skipped += 1
        compiled.append((int(suite["fraction"]), sels))
    total_sel = sum(len(s) for _, s in compiled)
    print(f"selectors compiled: {total_sel}, skipped (unsupported): {skipped}")

    times = []
    n_queries = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n = 0
        for fraction, sels in compiled:
            for _ in range(max(1, fraction // 5)):
                for cs in sels:
                    cs.match_ids(dom)
                    n += 1
        times.append(time.perf_counter() - t0)
        n_queries = n
    mean = statistics.mean(times)
    print(
        f"{n_queries} queries/rep over {reps} reps: mean {mean:.3f}s "
        f"= {n_queries / mean:,.0f} selector-queries/sec"
    )


if __name__ == "__main__":
    main()
