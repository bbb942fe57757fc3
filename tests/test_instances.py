"""shared_instance: config-keyed reuse of streaming frontends.

Covers docs/ROADMAP.md item 10's supported pattern — a high-churn caller
(one frontend per client/reconnect) must reuse executables instead of
recompiling per construction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from melspec_tpu.config import DetectionSettings, MelConfig
from melspec_tpu.streaming.serving import MultiStreamFrontend
from melspec_tpu.streaming.stft import StreamingMel
from melspec_tpu.utils.instances import (clear_shared_instances,
                                         shared_instance,
                                         shared_instance_count)


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_shared_instances()
    yield
    clear_shared_instances()


def test_equal_config_returns_same_object():
    a = shared_instance(MultiStreamFrontend, MelConfig(), n_streams=4)
    b = shared_instance(MultiStreamFrontend, MelConfig(), n_streams=4)
    assert a is b
    assert shared_instance_count() == 1


def test_distinct_config_returns_distinct_objects():
    a = shared_instance(MultiStreamFrontend, MelConfig(), n_streams=4)
    b = shared_instance(MultiStreamFrontend, MelConfig(), n_streams=8)
    c = shared_instance(
        MultiStreamFrontend, MelConfig(), n_streams=4,
        settings=DetectionSettings(min_energy=2.0),
    )
    assert a is not b and a is not c and b is not c
    assert shared_instance_count() == 3


def test_equal_config_values_are_one_key():
    # frozen dataclasses compare by value: two separately constructed
    # MelConfig()s with equal fields must hit the same cache entry.
    cfg1 = MelConfig(fft_size=512, hop_size=160)
    cfg2 = MelConfig(fft_size=512, hop_size=160)
    assert cfg1 is not cfg2
    a = shared_instance(StreamingMel, cfg1)
    b = shared_instance(StreamingMel, cfg2)
    assert a is b


def test_shared_frontend_sessions_are_independent():
    # two "clients" running through ONE shared frontend with their own
    # carried states must see exactly what private instances produce.
    front = shared_instance(MultiStreamFrontend, MelConfig(), n_streams=2)
    rng = np.random.default_rng(7)
    chunks_a = rng.standard_normal((2, 6, 160), np.float32) * 0.1
    chunks_b = rng.standard_normal((2, 6, 160), np.float32) * 0.1

    sa, sb = front.init(), front.init()
    sa, qa, *_ = front.push_many(sa, chunks_a)
    sb, qb, *_ = front.push_many(sb, chunks_b)
    # session B's bytes through the shared instance == a private
    # instance fed only B's chunks
    private = MultiStreamFrontend(MelConfig(), n_streams=2)
    sp = private.init()
    sp, qp, *_ = private.push_many(sp, chunks_b)
    np.testing.assert_array_equal(np.asarray(qb), np.asarray(qp))
    # and A's second push continues A's own state, untouched by B
    sa2, qa2, *_ = front.push_many(sa, chunks_b)
    sp2 = private.init()
    sp2, _, *_ = private.push_many(sp2, chunks_a)
    sp2, qp2, *_ = private.push_many(sp2, chunks_b)
    np.testing.assert_array_equal(np.asarray(qa2), np.asarray(qp2))


def test_unhashable_argument_raises_early():
    with pytest.raises(TypeError):
        shared_instance(dict, [np.zeros(3)])  # ndarray inside a list


def test_dict_and_list_args_are_frozen():
    a = shared_instance(tuple, [1, 2, 3])
    b = shared_instance(tuple, [1, 2, 3])
    assert a is b


def test_container_types_do_not_collide():
    """[160], (160,) and a dict of the same pairs must be distinct keys:
    a class that treats a list and a tuple differently must never be
    handed the other call's instance."""
    clear_shared_instances()

    class C:
        def __init__(self, v):
            self.v = v

    a = shared_instance(C, [160])
    b = shared_instance(C, (160,))
    c = shared_instance(C, {"a": 1})
    d = shared_instance(C, (("a", 1),))
    assert a is not b and c is not d
    assert isinstance(a.v, list) and isinstance(b.v, tuple)


def test_constructor_runs_outside_the_lock():
    """A constructor that itself calls shared_instance must not deadlock
    on the module lock."""
    clear_shared_instances()

    class Inner:
        pass

    class Outer:
        def __init__(self):
            self.inner = shared_instance(Inner)

    o = shared_instance(Outer)
    assert o.inner is shared_instance(Inner)
