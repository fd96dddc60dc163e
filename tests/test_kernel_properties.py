"""Property-based kernel parity (hypothesis): the banded production kernel
must agree with the naive recursive oracles on arbitrary inputs — the same
oracle-equivalence strategy the reference's own unit tests use
(SURVEY.md §5.1), plus the metric properties that hold for each variant.

Note restricted transposition (the reference's Schulz–Mihov variant) is NOT
a metric (triangle inequality can fail), so only symmetry/identity are
asserted there.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from liblevenshtein_spark.kernels.banded import batch_banded_distance
from liblevenshtein_spark.kernels.oracles import distance as naive_distance

ALPHA = "abcx"
texts = st.text(alphabet=ALPHA, max_size=24)
ns = st.integers(min_value=0, max_value=3)
algos = st.sampled_from(["standard", "transposition", "merge_and_split"])


@settings(max_examples=300, deadline=None)
@given(texts, texts, ns, algos)
def test_banded_equals_naive_oracle(a, b, n, algo):
    got = int(batch_banded_distance([a], [b], n, algo)[0])
    true = naive_distance(a, b, algo)
    want = true if true <= n else n + 1
    assert got == want, (a, b, n, algo, true, got)


@settings(max_examples=150, deadline=None)
@given(texts, texts, ns, algos)
def test_symmetry(a, b, n, algo):
    d_ab = int(batch_banded_distance([a], [b], n, algo)[0])
    d_ba = int(batch_banded_distance([b], [a], n, algo)[0])
    assert d_ab == d_ba


@settings(max_examples=60, deadline=None)
@given(texts, ns, algos)
def test_identity(a, n, algo):
    assert int(batch_banded_distance([a], [a], n, algo)[0]) == 0


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(texts, texts), max_size=40), ns, algos)
def test_batch_equals_scalar(pairs, n, algo):
    """Batch vectorization (compaction, chunking, narrow dtypes) must not
    change any individual answer."""
    if not pairs:
        return
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    batch = batch_banded_distance(a, b, n, algo).tolist()
    singles = [int(batch_banded_distance([x], [y], n, algo)[0]) for x, y in pairs]
    assert batch == singles
