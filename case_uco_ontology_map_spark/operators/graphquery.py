"""Basic-graph-pattern (BGP) query compiler over the emitted triple table —
the consumer-side query surface of the KG: a SPARQL-style conjunction of
``(subject, predicate, object)`` patterns compiled to a DataFrame join
tree. (No reference counterpart as code — the reference emits JSON-LD for
downstream SPARQL stores; this gives the same query shape natively on the
Spark triple table, cf. the 2-hop traversal the contract's
``graph_traverse`` query pins.)

Compilation strategy (Spark-first, no driver-side row work):

- Each pattern becomes one scan of the triple frame with its CONSTANT
  terms as pushed filters — on the materialized triple table (bucketed by
  subject, see ``plans.pipeline.run_pipeline``) a constant subject prunes
  to one bucket's files, and constant predicates are low-cardinality
  dictionary-encoded parquet columns (row-group skippable).
- Join order is chosen greedily by a bound-term selectivity score
  (constant subject ≫ constant object > constant predicate — predicates
  are the low-cardinality dimension of any triple store), starting from
  the most selective pattern and always extending through a shared
  variable, so no cartesian product ever reaches Catalyst unless the
  caller explicitly opts in (``allow_cartesian=True``).
- Joins are plain equi-joins on the shared variable columns: AQE
  broadcasts a pattern frame once a constant filter has made it small,
  and skew-splits a hot join key (a hub node) at runtime. Nothing here
  fights the optimizer — the compiler only fixes the join ORDER (which
  Catalyst cannot infer without cardinality stats on variable bindings).

A term is a variable iff it starts with ``?``; anything else matches the
column value literally. A variable repeated WITHIN one pattern compiles
to an intra-row equality filter; across patterns it becomes the join key.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Pattern = Tuple[str, str, str]

#: Selectivity weight of a CONSTANT in each triple position. Subjects are
#: near-unique (one node id), objects split between IRIs (selective) and
#: literals, predicates are the handful of ontology properties.
_BOUND_WEIGHT = {"subj": 4, "obj": 2, "pred": 1}


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _var(term: str) -> str:
    return term[1:]


def pattern_vars(pattern: Pattern) -> List[str]:
    """Variable names of one pattern, in subj/pred/obj position order,
    deduplicated (repeated variable = one binding)."""
    seen: List[str] = []
    for t in pattern:
        if _is_var(t) and _var(t) not in seen:
            seen.append(_var(t))
    return seen


def _pattern_score(pattern: Pattern) -> int:
    cols = ("subj", "pred", "obj")
    return sum(
        _BOUND_WEIGHT[c] for c, t in zip(cols, pattern) if not _is_var(t)
    )


def _compile_pattern(
    triples: DataFrame,
    pattern: Pattern,
    cols: Tuple[str, str, str],
) -> DataFrame:
    """One pattern → scan + constant filters (+ repeated-var equality),
    projected to its variable columns."""
    out = triples
    position_of: Dict[str, str] = {}
    for col, term in zip(cols, pattern):
        if _is_var(term):
            v = _var(term)
            if v in position_of:
                # same variable twice in one pattern: intra-row equality
                out = out.filter(F.col(col) == F.col(position_of[v]))
            else:
                position_of[v] = col
        else:
            out = out.filter(F.col(col) == F.lit(term))
    if not position_of:
        # fully-ground pattern: existence check; keep a constant column so
        # the frame is non-empty schema-wise and joinable via cross of 0/1
        # rows — callers almost never do this, but it must not crash.
        return out.select(F.lit(1).alias("_ground")).limit(1)
    return out.select(
        *[F.col(c).alias(v) for v, c in position_of.items()]
    )


def join_order(patterns: Sequence[Pattern]) -> List[int]:
    """Greedy bound-term join order: start at the most selective pattern,
    then repeatedly take the most selective pattern sharing ≥1 variable
    with the already-bound set. Returns pattern indices. Raises if the
    conjunction is disconnected (a cartesian product) — callers opt into
    that explicitly via ``bgp_query(allow_cartesian=True)``."""
    if not patterns:
        raise ValueError("bgp_query needs at least one pattern")
    remaining = list(range(len(patterns)))
    # seed: max score, ties to the earliest-written pattern (deterministic)
    seed = max(remaining, key=lambda i: (_pattern_score(patterns[i]), -i))
    order = [seed]
    remaining.remove(seed)
    bound = set(pattern_vars(patterns[seed]))
    while remaining:
        connected = [
            i for i in remaining if bound & set(pattern_vars(patterns[i]))
        ]
        if not connected:
            raise ValueError(
                "disconnected BGP (patterns share no variable with the "
                "joined set) — this is a cartesian product; pass "
                "allow_cartesian=True if you really mean it"
            )
        nxt = max(connected, key=lambda i: (_pattern_score(patterns[i]), -i))
        order.append(nxt)
        remaining.remove(nxt)
        bound |= set(pattern_vars(patterns[nxt]))
    return order


def bgp_query(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    select: Optional[Sequence[str]] = None,
    distinct: bool = False,
    allow_cartesian: bool = False,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Conjunctive triple-pattern match → DataFrame of variable bindings.

    ``patterns``: ``[(s, p, o), ...]`` where a term starting with ``?`` is
    a variable and anything else a constant. ``select``: output variable
    names (no ``?``), default all variables in first-appearance order.
    ``distinct=False`` keeps SPARQL bag semantics.

    Scale: each pattern is one filtered scan of the (bucket-partitioned)
    triple table; the join tree is equi-joins on binding columns in
    greedy most-selective-first order; AQE broadcasts/skew-splits at
    runtime. No Python runs per row and no cartesian join is planned
    unless ``allow_cartesian=True``.
    """
    cols = (subj_col, pred_col, obj_col)
    try:
        order = join_order(patterns)
    except ValueError:
        if not allow_cartesian:
            raise
        # degenerate explicit opt-in: join connected groups greedily and
        # cross the leftovers in written order
        order = list(range(len(patterns)))
    compiled = [_compile_pattern(triples, p, cols) for p in patterns]
    out = compiled[order[0]]
    bound = set(out.columns)
    for i in order[1:]:
        nxt = compiled[i]
        shared = sorted(bound & set(nxt.columns))
        out = out.join(nxt, on=shared) if shared else out.crossJoin(nxt)
        bound |= set(nxt.columns)
    all_vars: List[str] = []
    for p in patterns:
        for v in pattern_vars(p):
            if v not in all_vars:
                all_vars.append(v)
    keep = list(select) if select is not None else all_vars
    missing = [v for v in keep if v not in bound]
    if missing:
        raise ValueError(f"select references unbound variables: {missing}")
    out = out.select(*keep)
    return out.distinct() if distinct else out


def bgp_sql(
    patterns: Sequence[Pattern],
    select: Optional[Sequence[str]] = None,
    distinct: bool = False,
    table: str = "g",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> str:
    """The same BGP as portable ANSI SQL over a triple table/CTE named
    ``table`` — one aliased scan per pattern joined on shared variables.
    Used by the contract oracle so DuckDB replays the identical semantics
    (join ORDER does not affect the result set, only the plan)."""
    cols = (subj_col, pred_col, obj_col)
    aliases = [f"t{i}" for i in range(len(patterns))]
    where: List[str] = []
    binding: Dict[str, str] = {}  # var -> first qualified column
    for alias, pattern in zip(aliases, patterns):
        for col, term in zip(cols, pattern):
            q = f"{alias}.{col}"
            if _is_var(term):
                v = _var(term)
                if v in binding:
                    where.append(f"{q} = {binding[v]}")
                else:
                    binding[v] = q
            else:
                where.append(f"{q} = '" + term.replace("'", "''") + "'")
    all_vars: List[str] = []
    for p in patterns:
        for v in pattern_vars(p):
            if v not in all_vars:
                all_vars.append(v)
    keep = list(select) if select is not None else all_vars
    proj = ", ".join(f"{binding[v]} AS {v}" for v in keep)
    frm = " CROSS JOIN ".join(f"{table} {a}" for a in aliases)
    sql = f"SELECT {'DISTINCT ' if distinct else ''}{proj} FROM {frm}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    return sql
