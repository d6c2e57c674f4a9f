"""Round-14 STAGED probe cohort — written in round 13, NOT registered.

The r13 verification window closed with its 5-probe cohort pinned at
registration (the r11 ≤5-per-round rule, re-affirmed by the r12
verdict task 4 and CI-pinned by tests/test_registry.py); registering
more probes mid-round would either breach the cap or reopen the
never-driver-verified set. These probes are therefore STAGED: the
operator code, probe callables, DuckDB oracles, and local oracle-
equivalence tests (tests/test_round14_staged.py) are complete and
green, but nothing here touches the registry. At r14 start the
round-open procedure (verify skill, "Registry r13" note) moves each
entry to a ``@query`` registration in this module with tier 30 in
``registry.ROUND_TIERS`` — a mechanical change, after which the
normal 3-scale sweep re-earns their records.

Every probe follows the determinism contract (registry module doc):
exact integer accumulation, ONE double chain per emitted value,
identical aliases both sides, pinned total ORDER BY, nonnegative DIV
parity, md5 as the only cross-engine hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import QuerySpec

#: name -> QuerySpec for every staged probe. Deliberately NOT fed into
#: registry.REGISTRY (see module doc); tests/test_round14_staged.py
#: runs the same oracle comparison the registered probes get.
STAGED: dict[str, QuerySpec] = {}


def _staged(name: str, oracle: str | None = None,
            tags: tuple[str, ...] = (), doc: str = ""):
    """@query's twin for staged probes: identical wrapping (runtime
    conf re-applied so results survive a hostile driver session),
    identical QuerySpec shape, NO registration side effect."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..session import apply_runtime_conf
            apply_runtime_conf(spark)
            return fn(spark, sf_dir)

        STAGED[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle,
                                 tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn
    return deco


# --------------------------------------------------------------------------
# 1. graph_scc — strongly connected components on a cyclic digraph
# --------------------------------------------------------------------------
#
# The probe graph must CONTAIN cycles (the digit hierarchy every other
# graph probe rides is a forest, where SCC is vacuously all-singletons):
# custkeys tile into directed 8-rings (u -> next offset in its block of
# 8), and one-way chords (offset-3 node -> the next block's offset-3
# node, chains capped at 3 blocks) make the condensation a nontrivial
# DAG without merging rings. Brute-force-verified at every test scale:
# max shortest-path distance is EXACTLY 16 (= the closure horizon:
# 7 ring steps + 2 chords + 7 ring steps), reach <= 24 nodes/node, so
# the bounded Spark closure and the oracle's unbounded recursive
# fixpoint provably agree. Partial trailing blocks lose their wrap
# edge (target key absent -> semi-join drops it) and become paths:
# singleton SCCs, exercised rather than avoided.

_SCC_ORACLE = """
WITH RECURSIVE e AS (
  SELECT k AS s, t AS d FROM (
    SELECT c_custkey AS k,
           (c_custkey - (c_custkey % 8)) + ((c_custkey % 8 + 1) % 8)
             AS t
    FROM customer
    UNION ALL
    SELECT c_custkey AS k, c_custkey + 8 AS t FROM customer
    WHERE c_custkey % 8 = 3 AND (c_custkey // 8) % 3 <> 2
  ) cand
  WHERE t IN (SELECT c_custkey FROM customer)
),
nodes AS (
  SELECT DISTINCT node FROM
    (SELECT s AS node FROM e UNION ALL SELECT d FROM e) t
),
reach AS (
  SELECT s AS node, d AS anc FROM e
  UNION
  SELECT r.node, e.d FROM reach r JOIN e ON e.s = r.anc
),
r2 AS (
  SELECT node, anc FROM reach
  UNION
  SELECT node, node AS anc FROM nodes
),
mutual AS (
  SELECT a.node, a.anc
  FROM r2 a JOIN r2 b ON a.node = b.anc AND a.anc = b.node
),
scc AS (SELECT node, min(anc) AS scc_id FROM mutual GROUP BY node),
sz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
       FROM scc GROUP BY 1)
SELECT s.node, s.scc_id, z.scc_size
FROM scc s JOIN sz z USING (scc_id)
ORDER BY s.node
"""


@_staged(
    "graph_scc",
    oracle=_SCC_ORACLE,
    tags=("graph", "recursive"),
    doc="Strongly connected components (operators/graph.py:"
        "strongly_connected_components) over a derived cyclic digraph "
        "of custkey 8-rings chained by one-way chords — the directed "
        "counterpart of dedup_clusters' undirected connected "
        "components, and the condensation step cycle-safe DAG "
        "analytics start from. u,v share an SCC iff mutually "
        "reachable: ONE bounded min-plus closure (shared "
        "_minplus_doubling, 4 rounds), identity pairs, then reach ∩ "
        "reach-transpose as a single left-semi equi-join; scc_id is "
        "the min mutual node (min-label convention), sizes one more "
        "id-grain aggregate. The oracle replays it as an UNBOUNDED "
        "recursive-CTE fixpoint (UNION-distinct terminates on "
        "cycles), valid because the probe graph's max shortest path "
        "is brute-force-pinned at exactly the 16-hop horizon "
        "(tests/test_round14_staged.py). Complete 8-rings resolve to "
        "size-8 components, trailing partial blocks to singletons; "
        "chords never merge rings (one-way), making the answer "
        "structurally nontrivial in both directions.",
)
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import strongly_connected_components
    c = (load_table(spark, sf_dir, "customer")
         .select(F.col("c_custkey").alias("k")))
    ring = c.select(
        "k",
        ((F.col("k") - F.col("k") % 8)
         + ((F.col("k") % 8 + 1) % 8)).alias("t"))
    chord = (c.filter((F.col("k") % 8 == 3)
                      & (F.expr("k DIV 8") % 3 != 2))
             .select("k", (F.col("k") + 8).alias("t")))
    cand = ring.unionByName(chord)
    # eager lineage cut BEFORE the doubling loop: the closure's
    # logical tree replicates its seed 3^rounds times, and this
    # 5-operator edge construction (2 scans + union + semi-join)
    # multiplied out dominates analyzer time (the SCC measurement in
    # operators/graph.py:strongly_connected_components). The edge
    # list is O(nodes) rows — checkpointing it is cheap and flattens
    # every copy to one LogicalRDD scan.
    edges = (cand.join(c.select(F.col("k").alias("t")), "t",
                       "left_semi")
             .select(F.col("k").alias("src"), F.col("t").alias("dst"))
             .localCheckpoint(eager=True))
    return (strongly_connected_components(edges, max_depth=16)
            .orderBy("node"))
