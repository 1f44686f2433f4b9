"""Property test for the BPE merge fold: the Spark aggregate() fold
(accumulator string whose last SEP segment is the lookahead carry)
must equal an independent pure-Python statement of greedy
left-to-right non-overlapping pair merging, for arbitrary symbol
sequences and merge pairs — including the adversarial cases (l == r
runs, merged tokens that equal the left symbol, single-symbol words).

One Spark job per example set: hypothesis draws a BATCH of cases and
the whole batch runs as one DataFrame.
"""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark.operators.bpe import SEP, _merged_sym


def py_merge(symbols, left, right):
    """Independent greedy non-overlapping left-to-right merge."""
    out = []
    i = 0
    while i < len(symbols):
        if (i + 1 < len(symbols)
                and symbols[i] == left and symbols[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


ALPHA = "ab"
sym = st.text(alphabet=ALPHA, min_size=1, max_size=2)
case = st.tuples(st.lists(sym, min_size=1, max_size=8), sym, sym)


@settings(max_examples=12, deadline=None)
@given(st.lists(case, min_size=1, max_size=25))
def test_spark_fold_matches_python_merge(spark, cases):
    rows = [(i, SEP.join(symbols), left, right)
            for i, (symbols, left, right) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "id long, sym string, l string, r string")
    # group cases by (l, r) so each merge pair gets its literal fold
    got = {}
    for left, right in {(c[1], c[2]) for c in cases}:
        sub = df.filter((F.col("l") == left) & (F.col("r") == right))
        for r_ in sub.select("id",
                             _merged_sym(left, right).alias("m")).collect():
            got[r_["id"]] = r_["m"]
    for i, (symbols, left, right) in enumerate(cases):
        want = SEP.join(py_merge(symbols, left, right))
        assert got[i] == want, (symbols, left, right, got[i].split(SEP))
