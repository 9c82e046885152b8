"""Selector-as-DataFrame plans over the exploded ``nodes`` table.

This is the distributed realization of SURVEY.md §2.4: the same selector
AST that drives the in-UDF matcher (:mod:`sparkhtml.selector`) compiles to
Spark Column expressions + joins + windows, so Catalyst owns the physical
plan (predicate pushdown into the parquet scan of a materialized nodes
table, join strategy, AQE):

    Q1-Q5   simple selectors  → boolean Column over one row
    Q7  '>' child             → equi-join on (doc_id, parent == node_id)
    Q6  ' ' descendant        → pre-order range join
                                (doc_id equi + anc.node_id < n < anc.subtree)
    Q8  '+' adjacent sibling  → lag() over (doc_id, parent) element window
    Q9  '~' general sibling   → max() over preceding element window
    Q10/Q11 nth-child & co    → row_number()/count() windows + modulo

The reference evaluates selectors as per-node closures over a DFS
(HTMLSelector.m:925-952); this plan form is strictly more parallel and
preserves semantics (tree order == node_id order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..selector import Complex, Compound, Simple, parse_selector

ELEMENT = 1


class UnsupportedSelector(ValueError):
    """Raised when a selector needs the in-UDF matcher instead (callers
    fall back to :func:`sparkhtml.spark.pipeline.css_select_text_udf`)."""


def _attr_value(name: str) -> Column:
    """Value of attribute ``name`` from the ordered attrs array (first
    occurrence wins, matching HTMLOrderedDictionary semantics)."""
    hits = F.filter("attrs", lambda a: a["name"] == F.lit(name))
    return F.when(F.size(hits) > 0, F.element_at(hits, 1)["value"])


def _simple_col(s: Simple, df: DataFrame) -> Column:
    is_el = F.col("kind") == ELEMENT
    if s.kind == "universal":
        return is_el
    if s.kind == "type":
        return is_el & (F.lower(F.col("tag")) == s.name)
    if s.kind == "id":
        return is_el & (_attr_value("id") == s.name)
    if s.kind == "class":
        return is_el & F.array_contains(
            F.split(F.coalesce(_attr_value("class"), F.lit("")), r"[ \t\n\r\f]+"),
            s.name,
        )
    if s.kind == "attr":
        v = _attr_value(s.name)
        if s.operator == "":
            return is_el & v.isNotNull()
        if s.operator == "=":
            return is_el & (v == s.value)
        if s.operator == "~=":
            return is_el & F.array_contains(F.split(v, r"[ \t\n\r\f]+"), s.value)
        if s.operator == "^=":
            return is_el & v.startswith(s.value)
        if s.operator == "$=":
            return is_el & v.endswith(s.value)
        if s.operator == "*=":
            return is_el & v.contains(s.value)
        if s.operator == "|=":
            return is_el & ((v == s.value) | v.startswith(s.value + "-"))
    if s.kind == "pseudo":
        return _pseudo_col(s, df)
    if s.kind == "not":
        inner = s.inner
        if (
            len(inner.complexes) == 1
            and len(inner.complexes[0].compounds) == 1
        ):
            return is_el & ~_compound_col(inner.complexes[0].compounds[0], df)
        raise UnsupportedSelector(":not with combinators")
    raise UnsupportedSelector(s.kind)


def _sibling_window(of_type_tag: Column | None = None) -> Window:
    w = Window.partitionBy("doc_id", "parent").orderBy("node_id")
    return w


def _pseudo_col(s: Simple, df: DataFrame) -> Column:
    """Structural pseudos as window expressions (Q10/Q11). The window runs
    over element rows only; we emulate with conditional rank arithmetic."""
    is_el = F.col("kind") == ELEMENT
    name = s.name
    w = Window.partitionBy("doc_id", "parent").orderBy("node_id")
    # rank among element siblings (non-elements get null rank)
    el_flag = F.when(is_el, 1).otherwise(0)
    rank = F.sum(el_flag).over(w)  # running count of elements up to self
    total = F.sum(el_flag).over(
        Window.partitionBy("doc_id", "parent")
    )
    if name == "first-child":
        return is_el & (rank == 1)
    if name == "last-child":
        return is_el & (rank == total)
    if name == "only-child":
        return is_el & (rank == 1) & (total == 1)
    if name in ("nth-child", "nth-last-child"):
        a, b = s.nth
        pos = rank if name == "nth-child" else (total - rank + 1)
        if a == 0:
            return is_el & (pos == b)
        d = pos - b
        return is_el & (d % a == 0) & ((d / a) >= 0)
    # of-type variants: rank among same-tag element siblings (Q11) —
    # same window keyed by (doc_id, parent, tag)
    wt = Window.partitionBy("doc_id", "parent", "tag").orderBy("node_id")
    trank = F.sum(el_flag).over(wt)
    ttotal = F.sum(el_flag).over(Window.partitionBy("doc_id", "parent", "tag"))
    if name == "first-of-type":
        return is_el & (trank == 1)
    if name == "last-of-type":
        return is_el & (trank == ttotal)
    if name == "only-of-type":
        return is_el & (ttotal == 1)
    if name in ("nth-of-type", "nth-last-of-type"):
        a, b = s.nth
        pos = trank if name == "nth-of-type" else (ttotal - trank + 1)
        if a == 0:
            return is_el & (pos == b)
        d = pos - b
        return is_el & (d % a == 0) & ((d / a) >= 0)
    if name == "root":
        return is_el & (F.col("depth") == 1)
    if name == "empty":
        # no element children and no non-empty text children: subtree has
        # only the node itself, or only empty-text descendants — cheap
        # approximation via subtree arithmetic needs a join; use the exact
        # rule on direct children via a self-join in _complex_df instead.
        raise UnsupportedSelector(":empty (use the in-UDF matcher)")
    raise UnsupportedSelector(f":{name} (use the in-UDF matcher)")


def _compound_col(comp: Compound, df: DataFrame) -> Column:
    col = F.col("kind") == ELEMENT
    for s in comp.simples:
        col = col & _simple_col(s, df)
    return col


_MATCH_COLS = [
    "doc_id", "node_id", "parent", "depth", "order", "kind", "tag", "ns",
    "attrs", "text", "subtree",
]


def css_select_df(nodes: DataFrame, selector: str) -> DataFrame:
    """Compile ``selector`` and return matching node rows in tree order.

    Supports the DataFrame-expressible subset (see module docstring);
    raises :class:`UnsupportedSelector` otherwise so callers fall back to
    the in-UDF matcher, mirroring the reference's single code path with a
    faster plan where available.
    """
    group = parse_selector(selector)
    result = None
    for cx in group.complexes:
        m = _complex_df(nodes, cx)
        result = m if result is None else result.unionByName(m)
    if len(group.complexes) > 1:
        # only a selector GROUP can produce duplicates (a node matching
        # two branches); filters and leftsemi joins never duplicate rows,
        # so the single-complex path skips the dedup exchange entirely
        result = result.dropDuplicates(["doc_id", "node_id"])
    return result.orderBy("doc_id", "node_id")


def _filter_mask(nodes: DataFrame, col: Column) -> DataFrame:
    # window expressions are not allowed in WHERE: materialize the mask as
    # a column first, then filter on it
    return nodes.withColumn("_m", col).filter("_m").drop("_m")


def _complex_df(nodes: DataFrame, cx: Complex) -> DataFrame:
    """Right-to-left: start from rightmost matches, constrain leftward."""
    cur = _filter_mask(nodes, _compound_col(cx.compounds[-1], nodes)).select(*_MATCH_COLS)
    for k in range(len(cx.combinators) - 1, -1, -1):
        comb = cx.combinators[k]
        left = _filter_mask(nodes, _compound_col(cx.compounds[k], nodes)).select(
            F.col("doc_id").alias("a_doc"),
            F.col("node_id").alias("a_id"),
            F.col("parent").alias("a_parent"),
            F.col("subtree").alias("a_subtree"),
        )
        if comb == ">":
            cur = (
                cur.join(
                    left,
                    (cur["doc_id"] == left["a_doc"])
                    & (cur["parent"] == left["a_id"]),
                    "leftsemi",
                )
            )
        elif comb == " ":
            cur = cur.join(
                left,
                (cur["doc_id"] == left["a_doc"])
                & (cur["node_id"] > left["a_id"])
                & (cur["node_id"] < left["a_subtree"]),
                "leftsemi",
            )
        elif comb in ("+", "~"):
            # sibling logic needs the full sibling set: recompute as a
            # window over all nodes, flagging left-matches
            lcol = _compound_col(cx.compounds[k], nodes)
            w = Window.partitionBy("doc_id", "parent").orderBy("node_id")
            is_el = F.col("kind") == ELEMENT
            flagged = nodes.withColumn("_lm", F.when(lcol, 1).otherwise(0))
            if comb == "+":
                # nearest preceding ELEMENT sibling is a left-match:
                # carry (last element's match flag) via last() over
                # preceding rows restricted to elements
                prev_el_match = F.last(
                    F.when(is_el, F.col("_lm")), ignorenulls=True
                ).over(w.rowsBetween(Window.unboundedPreceding, -1))
                flagged = flagged.withColumn("_ok", prev_el_match == 1)
            else:
                any_prev = F.max(F.when(is_el, F.col("_lm"))).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                )
                flagged = flagged.withColumn("_ok", any_prev == 1)
            ok = flagged.filter(F.col("_ok")).select(
                F.col("doc_id").alias("a_doc"), F.col("node_id").alias("a_id")
            )
            cur = cur.join(
                ok,
                (cur["doc_id"] == ok["a_doc"]) & (cur["node_id"] == ok["a_id"]),
                "leftsemi",
            )
        else:  # pragma: no cover
            raise UnsupportedSelector(comb)
    return cur


def css_count_by_tag(nodes: DataFrame) -> DataFrame:
    """Per-tag element counts — the canonical aggregate over nodes."""
    return (
        nodes.filter(F.col("kind") == ELEMENT)
        .groupBy("tag")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tag")
    )
