"""Distribution functor/monad semantics.

Ported corpus: deepvariant/distribution_functor_test.cc (all 12
cases: construction, factories, equality, map, bind, and generator
tracing incl. non-uniform weights and multi-parameter providers).
"""

from deepvariant_tpu.core.distribution import (
    Distribution,
    DistributionGenerator,
    dist_bind,
    dist_map,
    uniform,
    unit,
)


def test_construction_and_accessors():
    weight_map = {1: 2, 2: 3, 3: 1}
    dist = Distribution.from_weight_map(weight_map)
    assert dist.weight_map == weight_map
    assert dist.total_weight == 6


def test_zero_weights_dropped():
    dist = Distribution.from_weight_map({1: 2, 2: 0, 3: 1})
    assert dist.weight_map == {1: 2, 3: 1}
    assert dist.total_weight == 3


def test_gcd_normalization():
    dist = Distribution.from_weight_map({1: 2, 2: 4})
    assert dist.weight_map == {1: 1, 2: 2}
    assert dist.total_weight == 3


def test_unit_factory():
    dist = unit(5)
    assert dist.weight_map == {5: 1}
    assert dist.total_weight == 1


def test_uniform_factory():
    dist = uniform([1, 2, 3])
    assert dist.weight_map == {1: 1, 2: 1, 3: 1}
    assert dist.total_weight == 3


def test_distribution_equality():
    dist1 = Distribution.from_weight_map({1: 2, 2: 3})
    dist2 = Distribution.from_weight_map({1: 2, 2: 3})
    dist3 = Distribution.from_weight_map({1: 2, 3: 3})
    assert dist1 == dist2
    assert dist1 != dist3


def test_dist_map_simple():
    dist = uniform([1, 2, 3])
    mapped = dist_map(dist, lambda x: x * 2)
    assert mapped.weight_map == {2: 1, 4: 1, 6: 1}
    assert mapped.total_weight == 3


def test_dist_map_identity():
    dist = uniform([1, 2, 3])
    assert dist_map(dist, lambda x: x) == dist


def test_dist_map_different_cardinality():
    dist = uniform([1, 2])
    mapped = dist_map(
        dist, lambda x: "one" if x == 1 else "two_a_two_b"
    )
    assert mapped.weight_map == {"one": 1, "two_a_two_b": 1}
    assert mapped.total_weight == 2


def test_dist_map_merges_collisions():
    dist = Distribution.from_weight_map({1: 1, 2: 2, 3: 1})
    mapped = dist_map(dist, lambda x: x % 2)
    assert mapped.weight_map == {0: 1, 1: 1}
    assert mapped.total_weight == 2


def test_dist_bind_simple():
    dist = uniform([1, 2])
    bound = dist_bind(dist, lambda x: uniform([x, x + 1]))
    assert bound.weight_map == {1: 1, 2: 2, 3: 1}
    assert bound.total_weight == 4


def test_dist_bind_different_cardinality():
    dist = uniform([1, 2])
    bound = dist_bind(
        dist,
        lambda x: uniform(["a", "b", "c"]) if x == 1 else uniform(["d"]),
    )
    assert bound.weight_map == {"a": 1, "b": 1, "c": 1, "d": 3}
    assert bound.total_weight == 6


def test_generator_single_param():
    gen = DistributionGenerator(lambda x: uniform([x, x + 1]))
    traced = dist_map(gen, lambda provider: provider(1) + provider(2))
    assert traced.weight_map == {3: 1, 4: 2, 5: 1}
    assert traced.total_weight == 4


def test_generator_multi_param():
    gen = DistributionGenerator(lambda x, y: uniform([x + y]))
    traced = dist_map(
        gen, lambda provider: provider(1, 2) + provider(2, 1)
    )
    assert traced.weight_map == {6: 1}
    assert traced.total_weight == 1


def test_generator_different_return_type():
    gen = DistributionGenerator(lambda x: uniform(["a", "b"]))
    traced = dist_map(
        gen, lambda provider: provider(1) + provider(2)
    )
    assert traced.weight_map == {"aa": 1, "ab": 1, "ba": 1, "bb": 1}
    assert traced.total_weight == 4


def test_generator_non_uniform_single_param():
    gen = DistributionGenerator(
        lambda x: Distribution.from_weight_map({x: 2, x + 1: 1})
    )
    traced = dist_map(gen, lambda provider: provider(1) + provider(2))
    # x=1 -> {1:2, 2:1}; x=2 -> {2:2, 3:1}:
    # 1+2=3 (4), 1+3=4 (2), 2+2=4 (2), 2+3=5 (1).
    assert traced.weight_map == {3: 4, 4: 4, 5: 1}
    assert traced.total_weight == 9


def test_generator_non_uniform_multi_param():
    gen = DistributionGenerator(
        lambda x, y: Distribution.from_weight_map(
            {x + y: 3, x + y + 1: 2, x + y + 2: 1}
        )
    )
    traced = dist_map(
        gen, lambda provider: provider(1, 1) + provider(1, 2)
    )
    assert traced.weight_map == {5: 9, 6: 12, 7: 10, 8: 4, 9: 1}
    assert traced.total_weight == 36


def test_generator_deterministic_function():
    gen = DistributionGenerator(lambda x: uniform([x, x + 1]))
    traced = dist_map(gen, lambda provider: 42)
    assert traced.weight_map == {42: 1}
    assert traced.total_weight == 1


def test_generator_data_dependent_control_flow():
    # The call sequence depends on earlier draws: only paths that
    # actually execute a second draw branch on it.
    gen = DistributionGenerator(lambda x: uniform([0, 1]))
    def f(provider):
        if provider(1):
            return provider(2) + 10
        return -1
    traced = dist_map(gen, f)
    # P(-1) = 1/2; P(10) = 1/4; P(11) = 1/4.
    assert traced.weight_map == {-1: 2, 10: 1, 11: 1}
    assert traced.total_weight == 4
