"""bench.py wait-for-quiet preflight (VERDICT r13 item 2).

Two consecutive driver BENCH artifacts shipped ``load_warning: true``
(preflight load 19.01 / 16.58 from foreign contention). The bounded
wait gives such a run a chance to START quiet; a timed-out wait must
still stamp the warning honestly. These tests drive the helper with
injected load/clock/sleep hooks so they are deterministic and take no
wall-clock time; the real-load A/B (spinners vs quiet) is a round-close
NOTES demonstration, not a unit test.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
_spec = importlib.util.spec_from_file_location("pce_bench", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("pce_bench", bench)
_spec.loader.exec_module(bench)


class _FakeClock:
    """Monotonic clock advanced only by the fake sleep.

    Like the real pair, ``sleep`` always advances ``monotonic`` by a
    strictly positive amount (a real sleep(1e-13) still burns ~50 µs
    and monotonic has ns resolution): without the floor, a denormal
    budget makes ``1000.0 + 1e-13 == 1000.0`` and the model — not the
    code under test — spins forever."""

    def __init__(self) -> None:
        self.t = 1000.0
        self.sleeps: list[float] = []

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        assert s >= 0
        self.sleeps.append(s)  # requested durations (what the code asked for)
        before = self.t
        self.t += max(s, 1e-4)
        if self.t == before:  # float-epsilon guard at large t
            self.t = before + abs(before) * 1e-12

    def elapsed(self) -> float:
        return self.t - 1000.0


def _loads(samples):
    it = iter(samples)
    last = [None]

    def fn():
        try:
            last[0] = next(it)
        except StopIteration:
            pass  # hold the final sample (load stays put)
        return (last[0], 0.0, 0.0)

    return fn


def test_already_quiet_returns_immediately():
    clock = _FakeClock()
    load, waited = bench.wait_for_quiet(
        4.0, 120.0, poll_s=10.0, loadfn=_loads([0.85]), sleepfn=clock.sleep, clock=clock
    )
    assert load == 0.85
    assert waited == 0.0
    assert clock.sleeps == []  # no pointless sleep on a quiet box


def test_starts_when_load_drops_mid_wait():
    clock = _FakeClock()
    load, waited = bench.wait_for_quiet(
        4.0,
        120.0,
        poll_s=10.0,
        loadfn=_loads([16.58, 12.0, 7.3, 3.9]),
        sleepfn=clock.sleep,
        clock=clock,
    )
    assert load == 3.9 <= 4.0  # the RETURNED sample is the quiet one
    assert waited == 30.0  # three 10 s polls
    assert clock.sleeps == [10.0, 10.0, 10.0]


def test_timeout_returns_final_loaded_sample():
    clock = _FakeClock()
    load, waited = bench.wait_for_quiet(
        4.0, 120.0, poll_s=10.0, loadfn=_loads([19.01]), sleepfn=clock.sleep, clock=clock
    )
    assert load == 19.01  # caller stamps load_warning from this — honest
    assert waited >= 120.0
    # the budget bounds total sleep: 12 polls of 10 s, never more
    assert sum(clock.sleeps) <= 120.0 + 1e-9
    assert len(clock.sleeps) == 12


def test_zero_budget_disables_wait():
    clock = _FakeClock()
    load, waited = bench.wait_for_quiet(
        4.0, 0.0, poll_s=10.0, loadfn=_loads([16.58]), sleepfn=clock.sleep, clock=clock
    )
    assert load == 16.58
    assert waited == 0.0
    assert clock.sleeps == []  # SPARK_GRAFT_LOAD_WAIT=0 → exactly the old behavior


def test_final_poll_clipped_to_budget():
    clock = _FakeClock()
    bench.wait_for_quiet(
        4.0, 25.0, poll_s=10.0, loadfn=_loads([9.9]), sleepfn=clock.sleep, clock=clock
    )
    assert clock.sleeps == [10.0, 10.0, 5.0]  # last poll shrinks, never overruns


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        samples=st.lists(
            st.floats(min_value=0.0, max_value=64.0, allow_nan=False), min_size=1, max_size=40
        ),
        threshold=st.floats(min_value=0.5, max_value=20.0, allow_nan=False),
        budget=st.floats(min_value=0.0, max_value=60.0, allow_nan=False),
        poll=st.floats(min_value=0.5, max_value=30.0, allow_nan=False),
    )
    def test_wait_for_quiet_invariants(samples, threshold, budget, poll):
        """Properties that hold for ANY load trajectory:

        1. total sleep never exceeds the budget (the bench can't stall);
        2. a returned over-threshold sample implies the budget was
           exhausted (a warning is never stamped while wait remained);
        3. a returned under-threshold sample is the FIRST quiet poll
           (the bench starts the moment the box goes quiet);
        4. the stamped value is exactly the last sample taken.
        """
        clock = _FakeClock()
        taken = []
        inner = _loads(samples)

        def spy():
            v = inner()
            taken.append(v[0])
            return v

        load, waited = bench.wait_for_quiet(
            threshold, budget, poll_s=poll, loadfn=spy, sleepfn=clock.sleep, clock=clock
        )
        assert sum(clock.sleeps) <= budget + 1e-6  # never ASKS for more than the budget
        assert waited == round(clock.elapsed(), 1)  # reported wait is the real wait
        rounded = [round(v, 2) for v in taken]
        assert load == rounded[-1]
        if load > threshold:
            # warned only after the whole budget was spent waiting
            assert clock.elapsed() >= budget - 1e-6
            assert all(v > threshold for v in rounded), "gave up past a quiet sample"
        else:
            assert all(v > threshold for v in rounded[:-1]), "slept past the first quiet sample"

except ImportError:  # pragma: no cover - hypothesis is baked into this env
    pass
