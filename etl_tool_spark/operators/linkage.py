"""Record linkage: edit-distance fuzzy join via deletion neighborhoods.

Matching "the same entity spelled slightly differently" across two
tables (catalog reconciliation, metadata joins, spell-corrected lookups)
cannot run as an equi-join, and a theta-join on ``levenshtein(l, r) <= k``
is a cartesian product — the one plan shape that never survives scale.

The scalable formulation is symmetric-delete blocking (the SymSpell
construction, public domain spell-correction literature): every string
generates the set of variants reachable by deleting up to ``max_deletes``
characters, INCLUDING itself. Two strings within Levenshtein distance 1
(one substitution, insertion, or deletion) always share at least one
1-deletion variant:

  * substitution at position i  — both sides delete position i;
  * deletion (r = l minus a char) — l's delete at that position equals
    r's 0-delete;
  * insertion is the mirror of deletion.

So candidates = equi-join on the hashed variant, and an exact
``levenshtein`` verify on the (tiny) candidate set makes the result
EXACTLY "all cross pairs with distance <= max_distance" when
``max_deletes >= max_distance``: if lev(a, b) <= d then deleting (at
most d) characters of a and of b at the edit positions reaches a common
string, so depth-d neighborhoods always intersect — the standard
SymSpell completeness argument. The neighborhood grows O(len^d) — the
documented storage/shuffle trade, so depth 1 stays the default.

Scale shape: the neighborhood expansion is map-side (one higher-order
``transform`` over the string, no Python), the join is a plain
equi-join on a 60-bit hash (shuffle on short keys, AQE-managed), and
the verify is a JVM ``levenshtein`` on candidates only. Nothing is
quadratic in either table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.llm.text import hash64
from etl_tool_spark.operators.skew import verify_spread

__all__ = ["deletion_neighborhood", "edit_distance_join",
           "char_ngrams", "trigram_join"]


def _one_deletes(s: Column) -> Column:
    """Array of the strings reachable from ``s`` by deleting exactly one
    character (with duplicates; callers array_distinct)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.concat(F.substring(s, F.lit(1), i - 1),
                           F.substring(s, i + 1, F.length(s))))


def deletion_neighborhood(col: Column, max_deletes: int = 1) -> Column:
    """Array of 60-bit hashes of ``col`` and every string reachable by
    deleting up to ``max_deletes`` characters (distinct). Pure Column
    expression — nested higher-order functions, no UDF.

    Depth d is the recursive expansion: apply the exactly-one-delete
    step to the previous depth's frontier and union. Neighborhood size
    grows O(len^d / d!) — the documented SymSpell storage/shuffle trade,
    which is why d=1 stays the default and callers opt into d=2+ only
    when the match distance genuinely requires it."""
    if max_deletes < 1:
        raise ValueError("deletion_neighborhood requires max_deletes >= 1")
    s = col.cast("string")
    frontier = F.array_distinct(_one_deletes(s))
    variants = F.concat(F.array(s), frontier)
    for _ in range(max_deletes - 1):
        frontier = F.array_distinct(
            F.flatten(F.transform(frontier, _one_deletes)))
        variants = F.concat(variants, frontier)
    return F.transform(F.array_distinct(variants), hash64)


def edit_distance_join(left: DataFrame, right: DataFrame,
                       left_on: str, right_on: str,
                       max_distance: int = 1) -> DataFrame:
    """All cross-table pairs with ``levenshtein(left_on, right_on) <=
    max_distance``, without a cartesian product. Returns the left frame's
    columns + the right frame's + ``distance``; callers project.

    Column names must not overlap between the two frames (rename before
    calling) — keeps the result unambiguous."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"edit_distance_join: overlapping column names {sorted(overlap)}; "
            "rename one side first")
    if "_v" in left.columns or "_v" in right.columns:
        raise ValueError("edit_distance_join: '_v' is reserved; rename "
                         "that column first")
    l_var = left.withColumn(
        "_v", F.explode(deletion_neighborhood(F.col(left_on), max_distance)))
    r_var = right.withColumn(
        "_v", F.explode(deletion_neighborhood(F.col(right_on), max_distance)))
    cands = (l_var.join(r_var, "_v")
                  .drop("_v")
                  .dropDuplicates(left.columns + right.columns))
    dist = F.levenshtein(F.col(left_on), F.col(right_on))
    return (cands.withColumn("distance", dist)
                 .filter(F.col("distance") <= max_distance))


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams of a string (pg_trgm-style, without
    padding). Strings shorter than ``n`` contribute themselves, so no
    row silently vanishes from the index."""
    s = col.cast("string")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
        lambda i: F.substring(s, i, n))
    return F.array_distinct(grams)


def trigram_join(left: DataFrame, right: DataFrame,
                 left_on: str, right_on: str,
                 threshold: float = 0.5, n: int = 3,
                 max_df: int | None = None,
                 hash_keys: bool = True,
                 hash_grams: bool = True) -> DataFrame:
    """All cross-table pairs with character-n-gram Jaccard similarity
    >= ``threshold`` — the pg_trgm `%` fuzzy join, scale-shaped. Where
    edit_distance_join matches near-identical short strings (distance
    ≤ 2), trigram Jaccard tolerates proportionally more divergence in
    longer strings (word swaps, multi-char typos).

    Shape — prefix-filtered inverted index (the AllPairs bound, Bayardo
    et al. WWW'07, with two plan-shaped twists that finally made it
    win):

      1. Everything runs over the DISTINCT join-key strings only — the
         gram fan-out never carries payload columns, and identical keys
         hash once however many rows carry them.
      2. Grams are 64-bit-hashed and each key's distinct gram hashes
         sorted numerically; only the first |A| − ⌈t·|A|⌉ + 1 are
         indexed. Any total order over the gram universe validates the
         prefix lemma: Jaccard ≥ t forces |A∩B| ≥ t·|A∪B| ≥
         t·max(|A|,|B|), and the globally-smallest shared gram ranks
         within |X| − |A∩B| + 1 on BOTH sides, so it lands inside both
         prefixes — no false negatives. Hash order is also UNIFORM
         across the gram universe, so prefix document-frequencies stay
         ~(1−t)× the full dfs on every gram; a skewed order (e.g.
         lexicographic) concentrates everyone's prefix on the same
         low-sorting grams and re-inflates the candidate join
         (measured: 2.4M candidate-join rows lexicographic vs 1.4M
         hash-ordered on the hex regime below).
      3. Candidates = equi-join of the two prefix indexes, pruned by
         the PPJoin size + positional filters (index entries carry the
         gram's rank and the key's gram count; see the inline note)
         BEFORE the distinct on the (key-hash, key-hash) pair — ~2×
         fewer rows reach the verify joins on the hex regime.
         Verification attaches each side's full sorted gram-hash array
         (joins onto the key-sized frames, not the data-sized inputs)
         and computes the EXACT |A∩B| with a per-row
         ``array_intersect`` on primitive longs — no giant pair
         aggregation: the Σ df² gram-pair rows that dominated the
         direct count-then-filter form never exist, and long-array
         intersection runs ~10× faster than string-array intersection
         (measured 23s → 2s on 2M verify rows).
      4. The Jaccard filter runs before any payload join, so the key
         strings and payload columns land on the result-sized survivor
         frame only (~1000× smaller than the candidate frame on
         saturated alphabets); AQE broadcasts the survivors at runtime.

    Measured (sf0.1, local[32], warm JVM): hex md5 keys t=0.5 — direct
    inverted index 6.3s; prefix-filtered form 4.8s median in the
    round-6 quiet bench; +PPJoin size/positional pruning 4.0s median
    (same run conditions, sentinel-bracketed); 60-char prose keys
    t=0.6 — direct 143s, prefix-filtered 78s even with string grams. The round-3/4
    rejections of AllPairs (19.5s on the hex regime) measured a
    DIFFERENT implementation that ranked grams by document frequency
    with a global window job and verified through a second gram join;
    hash order needs no ranking job at all, and on near-uniform gram
    frequencies rare-first ordering buys nothing over it.

    Exactness is unconditional AND lazy. Hash identification (of keys
    and of grams) is only exact if the hash is injective on the actual
    key/gram universes, so a ONE-ROW broadcast gate — the same in-plan
    contract pattern as the repo's ANN recall gates — aggregates
    countDistinct(value) vs countDistinct(xxhash64(value)) for both
    universes over the DISTINCT-key frames (the universes over distinct
    keys equal those over all rows, and duplicate-heavy inputs never
    multiply the gram fan-out) and raises in-plan (``raise_error``) on
    any mismatch, the first time the result frame is acted on; the
    one-row verdict is lazily local-checkpointed so repeated actions on
    the result replay it for free. No eager driver job runs at call time
    (the round-4 form ran a countDistinct pre-job over both full key
    columns on every call — recorded by the round-4 gate bench as part
    of a 3.57s → 6.14s regression), and no ``raise_error`` sits in the
    row-wise hot path (a conditional raise inside the key projection
    is Unevaluable for codegen and measurably de-optimizes every
    expression stacked on it — measured +4.5s at sf0.1). At ~10⁹ keys
    the birthday bound makes a 64-bit collision a real event, not a
    curiosity; on collision the job fails loudly — rerun with
    ``hash_keys=False`` / ``hash_grams=False`` to identify keys/grams
    by their strings (no collision surface, heavier shuffle and ~10×
    slower verify respectively).

    ``max_df``: drop grams indexed by more than ``max_df`` distinct
    keys per side from the PREFIX index (the pg_trgm common-gram
    problem: 'the' pairs everything). Exactness caveat — a true pair
    whose shared prefix grams are ALL dropped is missed, so the default
    None keeps the exact contract the oracle checks; set it at scale
    where hot grams would otherwise dominate the candidate join. With
    ``max_df`` set, the PPJoin positional filter is DISABLED (its
    rank-based bound assumes the smallest common gram's row survives —
    a dropped hot gram invalidates the inference and could prune a
    qualifying pair); the size filter remains, since it uses true gram
    counts, not ranks.
    Returns left + right columns + ``similarity``; column names must
    not overlap."""
    if not 0.0 < threshold <= 1.0:
        # Jaccard lives in [0, 1]; at exactly 0 the prefix bound is
        # meaningless (pairs sharing NO gram would qualify, which no
        # inverted index can produce) and above 1 the prefix length
        # |A| - ceil(t*|A|) + 1 goes non-positive
        raise ValueError(
            f"trigram_join: threshold must be in (0, 1], got {threshold}")
    if n < 1:
        raise ValueError(f"trigram_join: n must be >= 1, got {n}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"trigram_join: overlapping column names {sorted(overlap)}; "
            "rename one side first")
    for reserved in ("_lh", "_rh", "similarity"):
        if reserved in left.columns or reserved in right.columns:
            raise ValueError(f"trigram_join: {reserved!r} is reserved; "
                             "rename that column first")

    def _key(c: str) -> Column:
        # null keys never produce gram rows (they are filtered from the
        # index), so a null payload join key must stay null — never the
        # constant xxhash64(NULL) — or it could spuriously equi-join a
        # real key's hash.
        k = F.col(c).cast("string")
        return F.when(k.isNotNull(), F.xxhash64(k)) if hash_keys else k

    def _distinct_keys(df: DataFrame, col: str) -> DataFrame:
        """Distinct non-null key strings as ``_k`` — the shared input of
        the prefix index AND the collision gate, so neither ever fans
        out over the raw (possibly duplicate-heavy) inputs."""
        return (df.select(F.col(col).cast("string").alias("_k"))
                  .where(F.col("_k").isNotNull())
                  .distinct())

    ldk = _distinct_keys(left, left_on)
    rdk = _distinct_keys(right, right_on)

    def _keys(keys: DataFrame, h: str) -> DataFrame:
        """(key-id ``h``, sorted indexed-gram array ``_gs``) per
        distinct non-null key. Pure codegen-friendly shape — the
        collision contracts live in the broadcast gate, not here."""
        grams = char_ngrams(F.col("_k"), n)
        indexed = (F.transform(grams, lambda g: F.xxhash64(g))
                   if hash_grams else grams)
        kid = F.xxhash64("_k") if hash_keys else F.col("_k")
        return keys.select(kid.alias(h), F.array_sort(indexed).alias("_gs"))

    lk = _keys(ldk, "_lh")
    rk = _keys(rdk, "_rh")

    def _prefix(df: DataFrame, h: str) -> DataFrame:
        # first |A| - ceil(t*|A|) + 1 grams in the global order; always
        # >= 1 gram, so no key vanishes from the index. The ceiling is
        # computed with relative+absolute slack (1e-9 each) UNDER the
        # double product: bare F.ceil(t * size) rounds up past the
        # filter's own boundary for many (t, |A|) combos — e.g.
        # t=0.28, |A|=25 gives double 7.000000000000001 → ceil 8, yet a
        # B⊆A pair with |A∩B|=7 PASSES the double-arithmetic Jaccard
        # filter (double(7/25) == double(0.28)), so the prefix must
        # reach rank 25−7+1=19, not 18 — a silent false negative that
        # violated the unconditional-exactness contract (round-5 advice).
        # Safety: a filter-passing pair has i/u ≥ t·(1−2⁻⁵²) with
        # u ≥ |A|, so i ≥ t·|A|·(1−2⁻⁵²); the 1e-9 relative slack
        # dominates every double rounding error for |A| < 2³¹, and
        # over-subtraction can only LENGTHEN the prefix (conservative),
        # never shorten it.
        plen = (F.size("_gs")
                - F.ceil(F.lit(threshold) * F.size("_gs")
                         * F.lit(1.0 - 1e-9) - F.lit(1e-9)).cast("int") + 1)
        # posexplode: each index entry carries its 1-based rank in the
        # key's gram order plus the key's gram count, feeding the
        # size + positional candidate filters below
        return (df.select(h, F.size("_gs").alias(f"_n{h}"),
                          F.posexplode(F.slice("_gs", F.lit(1), plen))
                          .alias(f"_p{h}", "_g"))
                  .withColumn(f"_p{h}", F.col(f"_p{h}") + 1))

    lp = _prefix(lk, "_lh")
    rp = _prefix(rk, "_rh")
    if max_df is not None:
        l_hot = (lp.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
                   .filter(F.col("_n") > max_df).select("_g"))
        r_hot = (rp.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
                   .filter(F.col("_n") > max_df).select("_g"))
        lp = lp.join(l_hot, "_g", "left_anti")
        rp = rp.join(r_hot, "_g", "left_anti")
    # PPJoin-style candidate pruning (Xiao et al. WWW'08, public
    # literature) BEFORE the pair distinct and the verify joins:
    #   * size filter — Jaccard ≥ t forces t·|A| ≤ |B| and t·|B| ≤ |A|;
    #   * positional filter — for the SMALLEST common gram, matched at
    #     1-based ranks (i, j), every common gram sits at rank ≥ i in A
    #     and ≥ j in B, so |A∩B| ≤ 1 + min(|A|−i, |B|−j); a qualifying
    #     pair needs |A∩B| ≥ ⌈t/(1+t)·(|A|+|B|)⌉ (from i/(|A|+|B|−i) ≥ t).
    # Occurrence rows for LARGER common grams may fail the positional
    # test spuriously (common grams can precede them), but the pair
    # survives through its smallest-common-gram row, whose bound is
    # exact-or-over — so distinct-after-filter keeps exactness. The
    # minoverlap ceiling carries the same conservative eps slack as the
    # prefix length (an under-approximation can only keep more rows).
    # Measured on the hex regime (t=0.5, ~30 grams/key): candidate rows
    # into the verify joins drop ~2×.
    tt = threshold / (1.0 + threshold)
    minov = F.ceil(F.lit(tt) * (F.col("_n_lh") + F.col("_n_rh"))
                   * F.lit(1.0 - 1e-9) - F.lit(1e-9))
    ubound = 1 + F.least(F.col("_n_lh") - F.col("_p_lh"),
                         F.col("_n_rh") - F.col("_p_rh"))
    sz_ok = ((F.col("_n_rh") >= F.lit(threshold) * F.col("_n_lh")
              * F.lit(1.0 - 1e-9) - F.lit(1e-9))
             & (F.col("_n_lh") >= F.lit(threshold) * F.col("_n_rh")
                * F.lit(1.0 - 1e-9) - F.lit(1e-9)))
    # the positional bound's exactness proof needs the SMALLEST common
    # gram's row to survive into the join — max_df may have dropped it
    # (its hotness is unrelated to the pair), in which case a larger
    # common gram's rank-based bound can spuriously prune a qualifying
    # pair (round-6 review finding: t=0.5, |A|=|B|=10, overlap 7, hot
    # smallest gram removed, next shared gram at rank 5 → ubound 6 <
    # minov 7). The size filter uses true gram COUNTS, not ranks, so it
    # stays valid under max_df; the positional filter does not.
    cand_ok = sz_ok if max_df is not None else sz_ok & (ubound >= minov)
    cands = (lp.join(rp, "_g")
               .filter(cand_ok)
               .select("_lh", "_rh").distinct())
    # pin verify parallelism count-based: each candidate row costs an
    # array_intersect over ~|key| gram hashes and AQE's byte-coalescing
    # serialized the verify stage (measured 6s ↔ 55s run-to-run on the
    # hex regime) — rationale + opt-out knob in skew.py:verify_spread
    cands = verify_spread(cands)
    verify = (cands.join(lk.select("_lh", F.col("_gs").alias("_la")), "_lh")
                   .join(rk.select("_rh", F.col("_gs").alias("_ra")), "_rh")
                   .withColumn("_i", F.size(F.array_intersect("_la", "_ra"))))
    sim = (F.col("_i")
           / (F.size("_la") + F.size("_ra") - F.col("_i")))
    pairs = (verify.filter(sim >= threshold)
                   .select("_lh", "_rh",
                           F.round(sim, 6).alias("similarity")))

    if hash_keys or hash_grams:
        # ONE-ROW in-plan gate: xxhash64 must be injective on the key
        # universe (when keys are hash-identified) and on the gram
        # universe (when grams are). countDistinct(x) ==
        # countDistinct(hash(x)) is exactly injectivity-on-the-universe.
        # Built from the DISTINCT-key frames, not the raw inputs: grams
        # derive deterministically from key strings, so the key/gram
        # universes over distinct keys equal those over all rows, and on
        # duplicate-heavy inputs the gram fan-out never multiplies by
        # row count (round-5 advice). Broadcast-scalar attach keeps
        # raise_error OUT of the row-wise hot path.
        def _kg(keys: DataFrame) -> DataFrame:
            return keys.select(
                "_k", F.explode(char_ngrams(F.col("_k"), n)).alias("_g"))
        u = _kg(ldk).unionByName(_kg(rdk))
        checks = []
        if hash_keys:
            checks.append((F.count_distinct(F.col("_k")),
                           F.count_distinct(F.xxhash64("_k")),
                           "hash_keys=False"))
        if hash_grams:
            checks.append((F.count_distinct(F.col("_g")),
                           F.count_distinct(F.xxhash64("_g")),
                           "hash_grams=False"))
        aggs = []
        for i, (a, b, _) in enumerate(checks):
            aggs += [a.alias(f"_a{i}"), b.alias(f"_b{i}")]
        ok: Column = F.lit(1)
        for i, (_, _, fix) in reversed(list(enumerate(checks))):
            ok = F.when(F.col(f"_a{i}") != F.col(f"_b{i}"),
                        F.raise_error(F.lit(
                            f"trigram_join: 64-bit hash collision; rerun "
                            f"with {fix}"))).otherwise(ok)
        # lazily local-checkpointed: the gate is embedded in the
        # returned plan, so without truncation EVERY action on the
        # result would re-run the distinct-key scan + two count_distinct
        # aggregations (round-5 advice). The checkpoint materializes the
        # ONE-ROW verdict on first action and replays it for free after;
        # storage cost is one row per session.
        gate = (u.agg(*aggs).select(ok.alias("_gate"))
                 .localCheckpoint(eager=False))
        # filtered (not dropped) so column pruning cannot elide the
        # raise_error branch out of the plan
        pairs = (pairs.crossJoin(F.broadcast(gate))
                      .where(F.col("_gate") == 1).drop("_gate"))

    # payload attach on the survivor frame only; AQE sees the
    # post-filter size at runtime and broadcasts when small
    return (left.withColumn("_lh", _key(left_on))
                .join(pairs, "_lh")
                .join(right.withColumn("_rh", _key(right_on)), "_rh")
                .select(*left.columns, *right.columns, "similarity"))
