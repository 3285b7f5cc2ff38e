"""Property-based trigram-join parity: for ANY pair of small string
tables (including empty strings, strings shorter than the gram width,
duplicate keys, and a 2-letter alphabet that maximizes gram collisions)
the prefix-filtered operator must return exactly the brute-force
all-pairs n-gram Jaccard set — pair identity AND rounded similarity —
on BOTH gram-identification paths (64-bit-hashed long arrays and raw
string arrays). This is the completeness proof of the prefix lemma as
implemented: if the |A|−⌈t·|A|⌉+1 prefix ever dropped a qualifying
pair, the hypothesis search space (short keys over a tiny alphabet,
where prefixes are 1–3 grams) is exactly where it would surface."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tool_spark.operators.linkage import trigram_join

keys = st.text(alphabet="ab", min_size=0, max_size=7)


def ref_grams(s: str, n: int = 3) -> frozenset:
    # char_ngrams contract: strings shorter than n contribute themselves
    return frozenset(s[i:i + n] for i in range(max(len(s) - (n - 1), 1)))


def ref_pairs(lrows, rrows, t):
    want = {}
    for li, ls in lrows:
        for ri, rs in rrows:
            a, b = ref_grams(ls), ref_grams(rs)
            sim = len(a & b) / len(a | b)
            if sim >= t:
                want[(li, ri)] = round(sim, 6)
    return want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(keys, min_size=1, max_size=6),
       st.lists(keys, min_size=1, max_size=6),
       st.sampled_from([0.28, 0.34, 0.5, 0.75]))
def test_trigram_join_equals_bruteforce(spark, lkeys, rkeys, t):
    lrows = [(i, s) for i, s in enumerate(lkeys)]
    rrows = [(100 + i, s) for i, s in enumerate(rkeys)]
    want = ref_pairs(lrows, rrows, t)
    left = spark.createDataFrame(lrows, "lid long, ltxt string")
    right = spark.createDataFrame(rrows, "rid long, rtxt string")
    for hash_grams in (True, False):
        got = {(r["lid"], r["rid"]): r["similarity"]
               for r in trigram_join(left, right, "ltxt", "rtxt",
                                     threshold=t,
                                     hash_grams=hash_grams).collect()}
        assert got == want, (hash_grams, lkeys, rkeys, t)


def test_prefix_ceiling_boundary_pair_not_dropped(spark):
    """Adversarial regression for the prefix-length float ceiling
    (round-5 advice): at t=0.28 with |A|=25 grams the bare double
    product 0.28*25 = 7.000000000000001 ceils to 8, shortening A's
    prefix to 18 — yet a B⊆A pair with |A∩B|=|B|=7 passes the Jaccard
    filter exactly (double(7/25) == double(0.28)). Construct the worst
    case deterministically with n=1 (grams == characters): pick B as
    the 7 characters of A that rank LAST in the gram order, so every
    shared gram sits at ranks 19–25 of A — only the corrected prefix
    (19) reaches the first of them. Asserted on BOTH gram paths (the
    hashed path orders by xxhash64, the string path lexicographically;
    the bottom-7 set is computed per path)."""
    from pyspark.sql import functions as F

    chars = [chr(ord("a") + i) for i in range(25)]
    one = spark.createDataFrame([(c,) for c in chars], "g string")
    by_hash = [r["g"] for r in
               one.orderBy(F.xxhash64(F.col("g"))).collect()]
    by_lex = sorted(chars)
    for hash_grams, order in ((True, by_hash), (False, by_lex)):
        a_txt = "".join(chars)
        b_txt = "".join(order[-7:])  # the 7 last-ranked grams of A
        left = spark.createDataFrame([(1, a_txt)], "lid long, ltxt string")
        right = spark.createDataFrame([(2, b_txt)], "rid long, rtxt string")
        for hash_keys in (True, False):
            got = trigram_join(left, right, "ltxt", "rtxt",
                               threshold=0.28, n=1,
                               hash_grams=hash_grams,
                               hash_keys=hash_keys).collect()
            assert [(r["lid"], r["rid"], r["similarity"]) for r in got] \
                == [(1, 2, 0.28)], (hash_grams, hash_keys, b_txt)


def test_max_df_disables_positional_filter_keeps_boundary_pair(spark):
    """Review-finding regression: with max_df dropping a pair's hot
    SMALLEST common gram, the PPJoin positional bound on the surviving
    shared grams can spuriously prune a qualifying pair (t=0.5,
    |A|=|B|=10, overlap 7: next shared gram at rank 5 on both sides →
    ubound 1+min(5,5)=6 < minov 7). The positional filter must be
    bypassed under max_df so the pair survives via that gram.

    Construction (n=1 grams, string sort): keys A=abcduvwxyz and
    B=aefguvwxyz share {a,u,v,w,x,y,z} (J=7/13≥0.5); 'a' is rank 1 in
    both and made hot (df 3 > max_df 2) by filler keys apq/ars whose
    2-gram prefixes contain 'a'; u..z sit at ranks 5..10, all beyond
    the positional bound."""
    from pyspark.sql import functions as F

    from etl_tool_spark.operators.linkage import trigram_join

    lefts = ["abcduvwxyz", "apq", "ars"]
    rights = ["aefguvwxyz", "apq", "ars"]
    L = spark.createDataFrame([(s,) for s in lefts], "lname string")
    R = spark.createDataFrame([(s,) for s in rights], "rname string")
    out = trigram_join(L, R, "lname", "rname", threshold=0.5, n=1,
                       max_df=2, hash_grams=False)
    pairs = {(r["lname"], r["rname"]): r["similarity"]
             for r in out.collect()}
    assert ("abcduvwxyz", "aefguvwxyz") in pairs
    assert pairs[("abcduvwxyz", "aefguvwxyz")] == round(7 / 13, 6)
    # sanity: exactness contract without max_df unchanged on same data
    full = trigram_join(L, R, "lname", "rname", threshold=0.5, n=1,
                        hash_grams=False)
    assert ("abcduvwxyz", "aefguvwxyz") in {
        (r["lname"], r["rname"]) for r in full.collect()}
