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
       st.sampled_from([0.34, 0.5, 0.75]))
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
