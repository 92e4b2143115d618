"""Golden tests for the java.util.Random replica (publicly documented
LCG; values cross-checked against the JDK)."""

from dxa_pagerank_spark.javarandom import JavaRandom


def test_next_double_known_values():
    assert JavaRandom(0).next_double() == 0.730967787376657
    assert JavaRandom(42).next_double() == 0.7275636800328681


def test_next_int_bounds_and_determinism():
    r1 = JavaRandom(21)
    r2 = JavaRandom(21)
    seq1 = [r1.next_int(1000) for _ in range(1000)]
    seq2 = [r2.next_int(1000) for _ in range(1000)]
    assert seq1 == seq2
    assert all(0 <= v < 1000 for v in seq1)


def test_next_int_power_of_two_path():
    r = JavaRandom(7)
    vals = [r.next_int(16) for _ in range(100)]
    assert all(0 <= v < 16 for v in vals)
    assert len(set(vals)) > 4
