"""Connected components over near-duplicate pair edges, and the
corpus-level dedup filter built on top of it.

Every similarity operator in :mod:`operators.dedup` /
:mod:`operators.similarity` emits **pairs** (``id_a, id_b``).  To
actually deduplicate a corpus those pairs must become **clusters**
(duplicate groups) with one kept representative each — transitively:
if A~B and B~C then A, B, C are one group even when A~C was never
emitted.  The reference's own dedup is the degenerate exact-key case
(rank-over-PK, ``serverless_processing_iceberg/main.py:64-74``);
similarity dedup at corpus scale needs the general graph version.

``connected_components`` runs the alternating **large-star /
small-star** algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) expressed as DataFrame joins and
``groupBy``-min aggregations:

- a round is two shuffles (one per star step), each keyed on an
  8-byte node id;
- edges strictly decrease toward min-id stars, converging in
  O(log n) rounds on pathological chains and 1-2 rounds on the
  star/clique shapes near-dup clusters actually have;
- above the small-graph gate the edge set never leaves the cluster,
  so the operator scales to corpora whose pair set exceeds any
  single machine; edge sets at or below ``SMALL_GRAPH_EDGE_CAP``
  (100 k, a few MB) are instead solved with a driver-side
  union-find, because per-round scheduling cost dwarfs the work on
  tiny graphs — a disclosed, size-gated driver path like the IVF
  trainer sample, not a scalability ceiling;
- every round ends in ``localCheckpoint`` — without it the iterated
  plan nests one join deeper per round and Catalyst re-analysis goes
  quadratic (and lineage re-execution exponential).

Fixpoint detection compares a (count, hash-sum) checksum of the edge
set between rounds — two cheap scalar aggregates, no driver
materialization of edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor is order-independent and cannot overflow — SUM of
    # full-range xxhash64 values overflows a long and raises
    # ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode.
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


# Edge-count gate for the driver-side union-find fast path: 100 k
# edges is a few MB of ids — far below any driver memory concern —
# while near-dup pair sets from a corpus small enough to produce so
# few edges gain nothing from 2-shuffles-per-round iteration (each
# distributed round costs ~0.5-1 s of fixed scheduling regardless of
# data; measured ~4 s on a 300-edge graph vs ~0.1 s locally). Same
# bounded-driver pattern as the IVF trainer sample and the capped
# exact-cosine kernel (operators/similarity.py) — disclosed, gated,
# and identical in output to the distributed path (asserted by
# tests/test_components.py equivalence tests).
SMALL_GRAPH_EDGE_CAP = 100_000


def _components_local(edges_rows, id_type, spark) -> DataFrame:
    """Union-find with path compression over a collected edge list;
    labels = min id per component, bit-identical to the distributed
    star algorithm's contract."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edges_rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    label: dict = {}
    for node in parent:
        root = find(node)
        cur = label.get(root)
        if cur is None or node < cur:
            label[root] = node
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("id", id_type, False),
            StructField("component", id_type, False),
        ]
    )
    rows = [(node, label[find(node)]) for node in parent]
    # LocalRelation, not createDataFrame(rows) (r15): the label table
    # is small by the edge-cap gate, and the RDD form cost one
    # Python-worker task per default partition on every scan plus
    # unknown-size planning for the anti-join it feeds.
    from ..localrel import local_df

    return local_df(spark, schema, rows)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGE_CAP,
) -> DataFrame:
    """Label every node of the undirected pair graph with the MINIMUM
    node id of its connected component.

    Parameters
    ----------
    pairs : DataFrame with two id columns (any orderable type —
        longs, strings); extra columns (similarity scores) ignored.
    max_rounds : safety bound; the algorithm converges in
        O(log n) rounds, so 25 covers any physically storable graph.
        Raises ``RuntimeError`` if somehow still moving (defensive —
        a silent wrong answer would poison a dedup downstream).
    small_graph_edges : edge sets at or below this size are solved
        with a driver-side union-find instead of distributed rounds
        (see ``SMALL_GRAPH_EDGE_CAP``); pass 0 to force the
        distributed path.

    Returns ``(id, component)`` with one row per distinct node id in
    ``pairs``; ``component`` is the min id of the node's component
    (representatives therefore label themselves).
    """
    # persist(), not an eager localCheckpoint: the pair computation
    # feeding this is often the expensive part of the whole job, and
    # a checkpoint boundary forces it through the RDD round-trip
    # (measured ~6× slower than persist + action;
    # pipeline/curation.py:26). The count() below materializes every
    # partition into the cache AND is the data the two gates need —
    # one job replaces the old checkpoint + isEmpty + limit-probe
    # trio. A full count is not wasted at web scale either: the
    # distributed rounds would materialize the edge set immediately
    # anyway. Blocks release via ContextCleaner when the DataFrame
    # is garbage-collected.
    from pyspark import StorageLevel

    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = edges.count()
    if n_edges == 0:
        edges.unpersist()
        from ..localrel import local_df

        schema = pairs.select(
            F.col(src).alias("id"), F.col(src).alias("component")
        ).schema
        return local_df(pairs.sparkSession, schema, [])

    if small_graph_edges and n_edges <= small_graph_edges:
        rows = edges.collect()
        # The cache served its two actions (count + collect);
        # release it eagerly rather than waiting for GC — also keeps
        # repeated invocations honest (no result-cache replay).
        edges.unpersist()
        return _components_local(
            rows,
            edges.schema["src"].dataType,
            pairs.sparkSession,
        )

    edges0 = edges
    prev = _edge_checksum(edges)
    for _ in range(max_rounds):
        # --- large-star: for every node u, connect each STRICTLY
        # LARGER neighbour to m = min(N(u) ∪ {u}).  Neighbourhoods
        # are over the symmetrized edge set.
        sym = edges.union(edges.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst")))
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        edges = (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # --- small-star: operate on edges pointed large→small
        # (large-star output already is); for every node u connect
        # each smaller-or-equal neighbour AND u itself to the min.
        mins = edges.groupBy("src").agg(F.min("dst").alias("m"))
        with_min = edges.join(mins, "src")
        edges = (
            with_min.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(with_min.select("src", F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _edge_checksum(edges)
        if cur == prev:
            # Converged: edges are (node → component-min) stars.
            # Round 1 consumed the initial edge cache into its own
            # checkpoint; release it.
            edges0.unpersist()
            roots = edges.select(F.col("dst").alias("src"),
                                 F.col("dst").alias("dst"))
            return (
                edges.union(roots)
                .distinct()
                .select(F.col("src").alias("id"),
                        F.col("dst").alias("component"))
            )
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def dedup_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Filter a corpus to one representative per duplicate group.

    ``pairs`` is any near-dup pair set (exact Jaccard, MinHash-LSH,
    SimHash, embedding cosine).  Pairs are closed transitively via
    :func:`connected_components`; the kept representative of each
    group is the MINIMUM id (deterministic across runs and engines).
    Rows never mentioned in ``pairs`` are kept untouched.

    One broadcast-or-shuffle ``left_anti`` join against the (small)
    set of non-representative ids — the corpus itself is scanned
    once and never shuffled.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.filter(F.col("id") != F.col("component")).select("id")
    return df.join(
        losers, df[id_col] == losers["id"], "left_anti"
    )
