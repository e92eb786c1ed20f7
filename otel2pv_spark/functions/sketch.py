"""Mergeable probabilistic sketches from md5-derived deterministic hashes.

Two primitives a 10^12-row maintained aggregate needs once exact state
outgrows its grain:

- **HyperLogLog distinct-count state** (Flajolet et al. 2007): the
  exact-distinct path (`operators/aggregate.rollup_user_pairs`) keeps
  one state row per (grain, user) pair — at trillion-turn scale that
  state is itself a big table. The HLL state is bounded by
  grains x 2^p rows (p=8 -> 256) regardless of user cardinality, and
  merges across append batches with a plain per-register MAX.
- **Bloom existence index**: the incremental-dedup path
  (`functions/dedup.minhash_band_table`) probes an O(corpus) band
  index; for EXACT-duplicate gating a packed Bloom bitmap of
  2^b bits (b=20 -> 16 K int64 words) answers "definitely new" with
  zero false negatives, merges via per-word bit OR, and is small
  enough to broadcast, so probing a new batch costs k broadcast hash
  joins and NO shuffle.

Every bit of both sketches derives from ``md5`` + integer arithmetic
only (the repo-wide convention, `functions/dedup.py:79`), so a DuckDB
oracle reproduces them exactly — the driver's hash-sensitive
correctness gate checks sketch *state*, not just estimates.

Reference parity: the reference keeps exact per-tree maps and has no
sketch layer (`GroupAndVerify/groupandverify/groupandverify.go:440-479`
holds whole trees in memory); these are scale-path additions per the
north rule's 10^12-turn target, not ports.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "hll_state",
    "with_register_rho",
    "hll_merge",
    "hll_estimate",
    "bloom_build",
    "bloom_merge",
    "bloom_probe",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "kmv_state",
    "kmv_merge",
    "kmv_quantiles",
]

_TWO33 = 1 << 33  # rho <= 33, so 2^(33-rho) is an exact BIGINT


def _hex_bigint(col, start: int, n: int):
    """First-``n`` hex chars of an md5 column as BIGINT — identical in
    DuckDB as ``('0x' || substr(md5(s), start, n))::BIGINT``."""
    return F.conv(F.substring(col, start, n), 16, 10).cast("bigint")


def _rho_expr(whex_col: str):
    """rho = (leading zero bits of the 32-bit word ``whex_col``) + 1,
    computed with string/CASE logic only so Spark and DuckDB agree
    bit-for-bit (log2-based floats round differently per engine).

    Each leading '0' hex char is 4 zero bits; the first non-zero hex
    char contributes 3/2/1/0 more ('1' -> 0b0001 has 3). An all-zero
    word trims to '' -> 32 zero bits -> rho 33."""
    trimmed = f"TRIM(LEADING '0' FROM {whex_col})"
    return F.expr(
        f"CAST(4 * (8 - length({trimmed})) + CASE substring({trimmed}, 1, 1) "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END + 1 AS INT)"
    )


def hll_state(
    df: DataFrame,
    keys: tuple[str, ...],
    value_col: str,
    p: int = 8,
    salt: str = "hll-v1",
) -> DataFrame:
    """Per-``keys`` HyperLogLog register state over ``value_col``.

    Output: (keys..., register INT, rho INT) with rho the max leading-
    zero rank seen in that register — one map-side-combined groupBy,
    state bounded by |keys-grains| x 2^p rows. NULL values are skipped
    (``count_distinct`` ignores them; a NULL register row would make
    the merged estimate disagree with the recompute, the same rule as
    ``rollup_user_pairs``).

    Hash split: md5 hex chars 1-8 pick the register (mod 2^p), chars
    9-16 are the 32-bit rank word — independent bits, one md5 per row.
    """
    out = with_register_rho(df, value_col, p=p, salt=salt)
    return (
        out.select(*keys, "register", "rho")
        .groupBy(*keys, "register")
        .agg(F.max("rho").alias("rho"))
    )


def with_register_rho(
    df: DataFrame, value_col: str, p: int = 8, salt: str = "hll-v1"
) -> DataFrame:
    """Append the (register, rho) pair for ``value_col`` to every row
    (NULL values dropped) — the per-row half of ``hll_state``, split
    out so the streaming port can put its watermark + window grain
    between this and the max-aggregation."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    h = F.md5(F.concat(F.col(value_col).cast("string"), F.lit("#" + salt)))
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("register", (_hex_bigint(h, 1, 8) % m).cast("int"))
        .withColumn("_whex", F.substring(h, 9, 8))
        .withColumn("rho", _rho_expr("_whex"))
        .drop("_whex")
    )


def hll_merge(states: list[DataFrame], keys: tuple[str, ...]) -> DataFrame:
    """Merge HLL states from disjoint (or overlapping — max is
    idempotent) batches: union + per-register MAX. Same shuffle grain
    as the state itself."""
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy(*keys, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(
    state: DataFrame,
    keys: tuple[str, ...],
    p: int = 8,
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Read a cardinality estimate off an ``hll_state`` table.

    Emits per ``keys``: ``registers_present`` and ``z_scaled`` (exact
    BIGINTs — the state facts the driver gate hashes), plus the
    rounded estimate. ``z_scaled`` is sum(2^(33-rho)) over present
    registers + 2^33 per absent register (rho 0), i.e. the harmonic
    denominator scaled by 2^33 so it stays integer-exact and
    order-independent.

    Estimator: alpha_m * m^2 / Z with the standard small-m alpha
    constants, plus linear counting (m * ln(m/zeros)) below the 2.5m
    threshold — the float math is a fixed expression over exact
    integers, reproduced verbatim in the DuckDB oracle.
    """
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    agg = state.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("registers_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - rho)")).alias("_sum_pow"),
    )
    z = (F.col("_sum_pow") + (m - F.col("registers_present")) * F.lit(_TWO33)).alias(
        "z_scaled"
    )
    agg = agg.select(*keys, "registers_present", z)
    raw = F.lit(alpha) * m * m * float(_TWO33) / F.col("z_scaled")
    zeros = F.lit(m) - F.col("registers_present")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *keys,
        "registers_present",
        "z_scaled",
        F.round(est).cast("bigint").alias(estimate_col),
    )


def hll_intersect_estimate(
    state_a: DataFrame,
    state_b: DataFrame,
    keys: tuple[str, ...],
    p: int = 8,
) -> DataFrame:
    """Distinct-set OVERLAP between two HLL states by inclusion-
    exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with est(A∪B) read
    off the per-register MAX merge (the union is EXACT at the register
    level — that is the HLL closure property; only the estimates are
    approximate). The retention / cross-sink-audience query at 10^12
    rows: both inputs are bounded register states, never row sets.

    Emits per key grain (inner join — grains present in both sides):
    n_a, n_b, n_union (each the standard estimator over exact integer
    state facts) and n_intersect_est = max(0, n_a + n_b − n_union),
    all BIGINT. Inclusion-exclusion error grows as the true overlap
    shrinks relative to the union (standard HLL caveat) — use it for
    audience overlap, not for near-zero-intersection proofs.
    """
    ea = hll_estimate(state_a, keys, p=p, estimate_col="n_a")
    eb = hll_estimate(state_b, keys, p=p, estimate_col="n_b")
    eu = hll_estimate(
        hll_merge([state_a, state_b], keys), keys, p=p,
        estimate_col="n_union",
    )
    ks = list(keys)
    j = (
        ea.select(*ks, "n_a")
        .join(eb.select(*ks, "n_b"), ks)
        .join(eu.select(*ks, "n_union"), ks)
    )
    return j.select(
        *ks,
        "n_a",
        "n_b",
        "n_union",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.col("n_a") + F.col("n_b") - F.col("n_union"),
        ).alias("n_intersect_est"),
    )


def _bloom_positions(key_col: str, bits_log2: int, k: int, salt: str):
    """The k bit positions for one key — k independent 32-bit md5
    slices mod 2^b. Identical in DuckDB as
    ``('0x'||substr(md5(key||'#i#salt'),1,8))::BIGINT % 2^b``."""
    nbits = 1 << bits_log2
    return [
        _hex_bigint(
            F.md5(
                F.concat(
                    F.col(key_col).cast("string"), F.lit(f"#{i}#{salt}")
                )
            ),
            1,
            8,
        )
        % nbits
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    bits_log2: int = 20,
    k: int = 4,
    salt: str = "bloom-v1",
) -> DataFrame:
    """Build a packed Bloom bitmap over ``key_col``: one row per int64
    word that has any bit set — (block BIGINT, word BIGINT), block =
    bitpos >> 6, word = OR of 1 << (bitpos & 63).

    Scale shape: the k positions explode map-side, then ONE
    map-side-combined bit_or groupBy on block; the result is at most
    2^b / 64 rows (b=20 -> 16 384) — broadcastable no matter how many
    keys went in. NULL keys contribute nothing."""
    pos = _bloom_positions(key_col, bits_log2, k, salt)
    exploded = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(F.array(*pos)).alias("bitpos"))
        .select(
            F.expr("shiftright(bitpos, 6)").alias("block"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 64 AS INT))"
            ).alias("_bit"),
        )
    )
    return exploded.groupBy("block").agg(F.bit_or("_bit").alias("word"))


def bloom_merge(blooms: list[DataFrame]) -> DataFrame:
    """Merge packed bitmaps from append batches: union + per-block
    bit OR (idempotent, associative — replays are harmless)."""
    unioned = reduce(DataFrame.unionByName, blooms)
    return unioned.groupBy("block").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    bits_log2: int = 20,
    k: int = 4,
    salt: str = "bloom-v1",
    out_col: str = "maybe_member",
) -> DataFrame:
    """Test every row of ``df`` against a packed bitmap: k broadcast
    hash joins (one per hash function), NO shuffle of the probe side —
    a row is a possible member iff every probed word has its bit set.
    False negatives are impossible; false-positive rate is the
    standard (1 - e^(-kn/2^b))^k.

    A NULL key probes to NULL (unknown), mirroring SQL three-valued
    logic rather than claiming "definitely new"."""
    pos = _bloom_positions(key_col, bits_log2, k, salt)
    out = df
    hits = []
    for i, p_expr in enumerate(pos):
        blk, msk, posc = f"_blk{i}", f"_msk{i}", f"_pos{i}"
        out = (
            out.withColumn(posc, p_expr)
            .withColumn(blk, F.expr(f"shiftright({posc}, 6)"))
            .withColumn(
                msk,
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({posc} % 64 AS INT))"),
            )
        )
        b = F.broadcast(
            bloom.select(
                F.col("block").alias(blk), F.col("word").alias(f"_w{i}")
            )
        )
        out = out.join(b, on=blk, how="left")
        out = out.withColumn(
            f"_hit{i}",
            F.coalesce(F.col(f"_w{i}"), F.lit(0)).bitwiseAND(F.col(msk)) != 0,
        ).drop(blk, msk, posc, f"_w{i}")
        hits.append(F.col(f"_hit{i}"))
    member = reduce(lambda a, b: a & b, hits)
    out = out.withColumn(
        out_col, F.when(F.col(key_col).isNotNull(), member)
    )
    return out.drop(*[f"_hit{i}" for i in range(k)])


def _cms_bucket(key_col: str, row: int, width_log2: int, salt: str):
    """Row ``row``'s bucket for one key — a 32-bit md5 slice mod 2^w,
    identical in DuckDB as
    ``('0x'||substr(md5(key||'#i#salt'),1,8))::BIGINT % 2^w``."""
    return _hex_bigint(
        F.md5(
            F.concat(F.col(key_col).cast("string"), F.lit(f"#{row}#{salt}"))
        ),
        1,
        8,
    ) % (1 << width_log2)


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width_log2: int = 10,
    salt: str = "cms-v1",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over ``key_col``:
    one row per non-empty cell — (row_idx INT, bucket BIGINT,
    cnt BIGINT). The third mergeable summary next to HLL (distincts)
    and Bloom (membership): CMS answers "about how many times" for ANY
    key with bounded state — depth x 2^w cells regardless of key
    cardinality — so per-key frequencies over a 10^12-row stream keep
    a maintainable aggregate where an exact (key, count) table grows
    with the vocabulary.

    Scale shape: the depth row-hashes explode map-side, then ONE
    map-side-combined sum groupBy on (row_idx, bucket); the result is
    <= depth x 2^w rows — broadcastable no matter how many keys went
    in. Merging append batches is a plain cell-wise sum
    (:func:`cms_merge`); NULL keys contribute nothing.
    """
    w = F.lit(1) if weight_col is None else F.col(weight_col).cast("bigint")
    cells = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("_k"), w.alias("_w"))
        .select(
            "_k",
            "_w",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_idx"),
        )
        .select(
            F.col("row_idx").cast("int").alias("row_idx"),
            # per-row bucket: md5(key || '#' || row || '#' || salt)
            (
                _hex_bigint(
                    F.md5(
                        F.concat(
                            F.col("_k"),
                            F.lit("#"),
                            F.col("row_idx").cast("string"),
                            F.lit(f"#{salt}"),
                        )
                    ),
                    1,
                    8,
                )
                % (1 << width_log2)
            ).alias("bucket"),
            F.col("_w"),
        )
    )
    return cells.groupBy("row_idx", "bucket").agg(F.sum("_w").alias("cnt"))


def cms_merge(states: list[DataFrame]) -> DataFrame:
    """Merge sketch states from append batches: cell-wise sum."""
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    df: DataFrame,
    key_col: str,
    cms: DataFrame,
    depth: int = 4,
    width_log2: int = 10,
    salt: str = "cms-v1",
    out_col: str = "cnt_est",
) -> DataFrame:
    """Point-query every row of ``df`` against a sketch: depth
    broadcast hash joins (the sketch is <= depth x 2^w rows), NO
    shuffle of the probe side — the estimate is the MIN over the
    key's depth cells (one-sided: never an underestimate; over by
    <= 2n/2^w with prob >= 1 - 2^-depth). An absent cell reads 0."""
    out = df
    ests = []
    for i in range(depth):
        bkt, cnt = f"_bkt{i}", f"_cnt{i}"
        out = out.withColumn(bkt, _cms_bucket(key_col, i, width_log2, salt))
        side = F.broadcast(
            cms.filter(F.col("row_idx") == i).select(
                F.col("bucket").alias(bkt), F.col("cnt").alias(cnt)
            )
        )
        out = out.join(side, on=bkt, how="left").drop(bkt)
        ests.append(F.coalesce(F.col(cnt), F.lit(0)))
    est = F.least(*ests)
    return out.withColumn(
        out_col, F.when(F.col(key_col).isNotNull(), est)
    ).drop(*[f"_cnt{i}" for i in range(depth)])


# --------------------------------------------------------------- KMV sample
def kmv_state(
    df: DataFrame,
    keys: tuple[str, ...],
    id_col: str,
    value_col: str,
    k: int = 256,
    salt: str = "kmv-v1",
) -> DataFrame:
    """Deterministic bottom-k row sample per key grain — the RANK
    sketch next to HLL (distincts), Bloom (membership) and CMS
    (frequencies): O(k) state per grain supporting quantile reads at
    UNBOUNDED value cardinality, where the fixed-bin histogram needs a
    known range and the exact percentile op needs per-distinct-value
    state.

    Every row draws a deterministic 60-bit priority from md5 of its
    ``id_col`` (which must uniquely identify rows — the KMV/bottom-k
    sampling rule: distinct ids give a uniform sample of ROWS); the
    state is the k smallest-priority (priority, value) pairs per grain,
    found with the shared two-level top-k (per-partition partial, final
    over <= k x P rows — a hot grain never sorts in one task).

    Mergeable and replay-idempotent: the bottom-k of a UNION of
    bottom-k states is exactly the bottom-k of the union of their
    inputs, and a replayed row reproduces its priority so the
    dedup-on-(grain, priority, value) in ``kmv_merge`` absorbs it —
    the same idempotence class as the HLL register MAX.

    Quantile error: a k-sample's q-quantile misses the true rank by
    O(sqrt(q(1-q)/k)) of the population (~3% of ranks at k=256,
    q=0.5). Values should be pre-quantized integers (micro-units) so
    reads are engine-exact.
    """
    from .topk import two_level_topk

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#" + salt)))
    base = df.filter(F.col(value_col).isNotNull()).select(
        *keys,
        _hex_bigint(h, 1, 15).alias("priority"),
        F.col(value_col).alias("value"),
    )
    return two_level_topk(
        base,
        group_cols=list(keys),
        order_cols=[F.col("priority").asc(), F.col("value").asc()],
        k=k,
    ).drop("rank")


def kmv_merge(
    states: list[DataFrame], keys: tuple[str, ...], k: int = 256
) -> DataFrame:
    """Union bottom-k states into the bottom-k of the combined input —
    exact (not approximate) merge: append batches keep their own
    states, the read path merges. Duplicate (grain, priority, value)
    rows from replays collapse before the final selection."""
    from functools import reduce

    from .topk import two_level_topk

    u = reduce(lambda a, b: a.unionByName(b), states).dropDuplicates(
        [*keys, "priority", "value"]
    )
    return two_level_topk(
        u,
        group_cols=list(keys),
        order_cols=[F.col("priority").asc(), F.col("value").asc()],
        k=k,
    ).drop("rank")


def kmv_quantiles(
    state: DataFrame,
    keys: tuple[str, ...],
    q_permille: tuple[int, ...] = (500, 950, 990),
) -> DataFrame:
    """Nearest-rank quantiles read off a KMV state alone (the corpus is
    never touched): per grain, sort the <= k sampled values and take
    rank ceil(q * n) — the ceil computed as integer cross-
    multiplication ``(q_permille * n + 999) DIV 1000`` so no float
    boundary can flip a rank between engines. Output one row per
    (grain, q_permille) with the sample size alongside."""
    per_key = state.groupBy(*keys).agg(
        F.sort_array(F.collect_list("value")).alias("_vals"),
        F.count("*").alias("n_sample"),
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)) for q in q_permille])
    ).alias("q_permille")
    return (
        per_key.select(*keys, "_vals", "n_sample", qs)
        .withColumn(
            "_rank",
            F.expr("(q_permille * n_sample + 999) DIV 1000").cast("int"),
        )
        .select(
            *keys,
            "q_permille",
            "n_sample",
            F.element_at(F.col("_vals"), F.greatest(F.col("_rank"), F.lit(1)))
            .alias("value"),
        )
    )
