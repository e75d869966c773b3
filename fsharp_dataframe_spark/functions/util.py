"""Shared plumbing for the corpus-scale functions."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# Sketch relations ((id, shingle), minhash signatures, simhash
# sketches, LSH buckets) are persisted MEMORY_AND_DISK so one
# tokenization pass feeds a self-join's two sides.  They are lazy:
# the blocks only exist after the CALLER materializes the result, so
# the operator cannot unpersist before returning.  Without a release
# hook a long session composing these operators accumulates cached
# blocks until the ContextCleaner gets around to them; this registry
# gives pipelines a deterministic release point.
_TRACKED_PERSISTS: list[DataFrame] = []


def pin_group_parallelism(df: DataFrame, group_cols) -> DataFrame:
    """Pin the exchange feeding a grouped PYTHON stage at the session's
    configured shuffle parallelism (OPTIMIZATION r15, guide §2).

    AQE's partition coalescing sizes post-shuffle partitions by BYTES,
    which is right for JVM operators but blind to opaque Python
    compute: a keyed Arrow fold over 100k small rows shuffles ~3 MB,
    AQE coalesces it to 1-2 partitions, and the per-group pandas work
    runs effectively serial (measured: q_ewma's fold stage ran 2 tasks
    / 5.1 s wall with 30 cores idle).  An explicit repartition with an
    EXPLICIT partition count is exempt from AQE coalescing and
    satisfies the downstream groupBy's ClusteredDistribution, so the
    group stage runs at the parallelism the session was configured for
    — locally the core count, on a cluster whatever
    spark.sql.shuffle.partitions the deploy tuned (we deliberately
    reuse that knob rather than invent one: it is exactly the
    parallelism this exchange would have had before AQE coalescing).
    Data bytes are unchanged; only the partition COUNT of one exchange
    is pinned, so results are bit-identical."""
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" on some platforms
        n = spark.sparkContext.defaultParallelism
    return df.repartition(n, *group_cols)


def _sql_double(x) -> str:
    """Shortest round-trip decimal of a double as a SQL literal token.
    repr() is guaranteed shortest-round-trip in Python 3 and Spark's
    parser feeds it to Java's Double.parseDouble, so the planned value
    is bit-identical to F.lit(x)."""
    import math

    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal {x!r} has no SQL form")
    return repr(v) + "D"


def lit_doubles(xs) -> "Column":
    """array<double> literal in ONE py4j round-trip (OPTIMIZATION r16,
    guide §7.3 driver-side planning): PySpark's F.lit(list) issues one
    py4j call per element (array(*[lit(x)...])), which measured ~2 s
    of pure driver time for an 8x64 centroid matrix under load — the
    whole literal is instead rendered as SQL text and parsed JVM-side
    in one F.expr call (milliseconds).  The resolved plan is the same
    CreateArray(Literal...) tree with bit-identical values, so results
    are unchanged; only Python-side construction time drops."""
    from pyspark.sql import functions as F

    vals = [float(x) for x in xs]
    if not vals:
        return F.lit([])  # typing corner; never hot
    return F.expr("array(" + ",".join(_sql_double(v) for v in vals) + ")")


def lit_double_matrix(rows) -> "Column":
    """array<array<double>> literal in ONE py4j round-trip — see
    lit_doubles (k x dim centroid / hyperplane matrices are the hot
    sites: 8x64 = 520 py4j calls through F.lit)."""
    from pyspark.sql import functions as F

    rs = [[float(x) for x in r] for r in rows]
    if not rs or any(not r for r in rs):
        return F.lit(rs)  # typing corner; never hot
    return F.expr("array(" + ",".join(
        "array(" + ",".join(_sql_double(v) for v in r) + ")"
        for r in rs) + ")")


def lit_array_sql(vals, value_type: str):
    """array<value_type> literal via ONE F.expr parse, or None when a
    value has no safe SQL rendering (caller keeps the per-element
    F.lit path).  Elements render as null / integer / shortest-repr
    double and the whole array is cast to ``value_type``, so the
    planned Literal is identical to F.array(*[F.lit(v).cast(t)...])
    after constant folding — only the py4j call count changes (one vs
    one per element; guide §7.3)."""
    import math

    from pyspark.sql import functions as F

    toks = []
    for v in vals:
        if v is None:
            toks.append("null")
        elif isinstance(v, bool):
            return None
        elif isinstance(v, int):
            toks.append(f"{v}L")
        elif isinstance(v, float):
            if not math.isfinite(v):
                return None
            toks.append(_sql_double(v))
        else:
            return None
    if not toks:
        return None
    return F.expr(
        f"cast(array({','.join(toks)}) as array<{value_type}>)")


def lit_longs(xs) -> "Column":
    """array<bigint> literal in ONE py4j round-trip — see lit_doubles."""
    from pyspark.sql import functions as F

    vals = [int(x) for x in xs]
    if not vals:
        return F.lit([]).cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def track_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for release_cached()/cache_scope()."""
    from pyspark import StorageLevel

    df = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    _TRACKED_PERSISTS.append(df)
    return df


def release_cached() -> int:
    """Unpersist every sketch relation cached by the corpus operators
    since the last release.  Call after materializing a pipeline stage
    (count/write); returns how many relations were released.  Safe to
    call any time — unpersist() is lazy-blocking=False and idempotent."""
    n = 0
    while _TRACKED_PERSISTS:
        _TRACKED_PERSISTS.pop().unpersist()
        n += 1
    return n


@contextmanager
def cache_scope():
    """Scope sketch caches to a pipeline stage::

        with cache_scope():
            pairs = ngram_jaccard_pairs(docs)
            pairs.write.parquet(out)       # materialize INSIDE
        # sketch blocks released here

    Only relations persisted inside the scope are released; persists
    tracked before entry are left alone (nesting-safe)."""
    mark = len(_TRACKED_PERSISTS)
    try:
        yield
    finally:
        while len(_TRACKED_PERSISTS) > mark:
            _TRACKED_PERSISTS.pop().unpersist()


# spread() is called repeatedly on the same relations inside one query
# (shingle tables feed joins and size aggregates); .rdd.getNumPartitions
# materializes a physical plan + Python RDD conversion each time, and on
# a parquet scan triggers file listing.  Memoize per semantic plan.
_NPART_CACHE: dict[tuple[int, int], int] = {}


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Round-robin a narrow projection across the cluster when the
    input arrives in fewer partitions than there are cores.

    Expression-heavy per-row work (tokenization, shingling, LSH plane
    dot products) executes with the INPUT's partitioning: a small
    parquet file is one partition, so the whole projection runs as ONE
    task no matter how many executors exist (measured: 5.4s -> 0.7s
    for shingling 5000 docs on 32 cores).  The repartition shuffles
    only the projected columns — trivial next to the joins these
    projections feed.  When the input already has enough partitions
    (the 100 TB case: thousands of file splits) this is a no-op, so
    the extra full-shuffle cost never materializes at scale.
    """
    sel = df.select(*cols) if cols else df
    p = df.sparkSession.sparkContext.defaultParallelism
    try:
        key = (id(df.sparkSession), sel.semanticHash())
    except Exception:
        key = None
    if key is not None and key in _NPART_CACHE:
        n = _NPART_CACHE[key]
    else:
        n = sel.rdd.getNumPartitions()
        if key is not None:
            if len(_NPART_CACHE) > 1024:
                _NPART_CACHE.clear()
            _NPART_CACHE[key] = n
    if n >= p:
        return sel
    return sel.repartition(p)


# Hot-key guard for per-key Arrow folds (r8 VERDICT ask #6): a grouped
# applyInPandas materializes each key's ENTIRE group as one Arrow batch
# in one Python worker, so a pathological key (one user with 10^9
# events) is a straggler/OOM at scale.  Most of the package's former
# folds were rewritten as JVM windows (cusum) or bucketed substrates
# (ewma/while global paths) where the group is size-bounded by
# construction; the sites that remain — user-supplied whole-group
# lambdas and keyed While predicates — wrap their fn in this guard so
# the job fails LOUDLY with remediation text instead of silently dying
# in the Arrow allocator.  The bound is rows, checked first thing in
# the worker: crossing it means "your key distribution does not fit
# this operator", not "raise the limit".
MAX_ARROW_GROUP_ROWS = 8_000_000


def guard_arrow_group(fn, op_name: str, max_rows: int | None = None):
    """Wrap a grouped-map pandas fn with a max-group-rows check.

    ``max_rows=None`` uses MAX_ARROW_GROUP_ROWS; pass an explicit bound
    to tighten it per operator.  The wrapped fn raises ValueError
    naming the operator, the observed group size, and the scale-path
    alternatives."""
    bound = MAX_ARROW_GROUP_ROWS if max_rows is None else int(max_rows)

    def guarded(pdf):
        if len(pdf) > bound:
            raise ValueError(
                f"{op_name}: one group holds {len(pdf)} rows "
                f"(> max_group_rows={bound}) — a per-key Arrow fold "
                "materializes the whole group in one Python worker, so "
                "a key this hot is a straggler/OOM at scale.  Split the "
                "key (salt / finer by=), pre-aggregate, or use the "
                "bucketed/windowed form of this operator if one exists.")
        return fn(pdf)

    return guarded
