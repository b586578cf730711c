"""Single-writer lease protocol, parameterized over BOTH lock
providers (r12 — VERDICT r11 next #3/#6 and ADVICE r11 #3):

- PosixLockProvider — create-exclusive via link(2) (atomic body),
  rename-to-unique steal, yank-verify-delete release;
- ObjectStoreLockProvider over FakeConditionalStore — conditional
  puts/deletes with real object-store race semantics.

The matrix pins the PROTOCOL (acquire/refuse/release/steal/
heartbeat/token-check) identically over both, plus the
provider-specific atomicity properties each round's findings
demanded: no empty-body crash window (posix), the release
yank-restore path (posix), and steal-vs-heartbeat generation
conditioning (object store).
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from etl_macropulse_br_spark.operators.statelock import (
    FakeConditionalStore,
    ObjectStoreLockProvider,
    PosixLockProvider,
    WriterLockHeld,
    writer_lock,
)


def _providers():
    return [
        ("posix", lambda: PosixLockProvider()),
        (
            "objectstore",
            lambda: ObjectStoreLockProvider(FakeConditionalStore()),
        ),
    ]


@pytest.fixture(params=_providers(), ids=lambda p: p[0])
def provider(request):
    return request.param[1]()


def test_exclusive_acquire_refuse_release_retake(tmp_path, provider):
    d = str(tmp_path / "state")
    with writer_lock(d, owner="first", provider=provider):
        with pytest.raises(WriterLockHeld, match="first"):
            with writer_lock(d, owner="second", provider=provider):
                pass
    # released: a new writer acquires cleanly
    with writer_lock(d, owner="third", provider=provider):
        pass


def test_stale_lock_is_stolen_once(tmp_path, provider):
    d = str(tmp_path / "state")
    lock = os.path.join(d, ".writer.lock")
    os.makedirs(d, exist_ok=True)
    assert provider.try_create(lock, "dead owner token=t0 t=0")
    _backdate(provider, lock, 7200)
    # stale: a waiter with a 1h window steals and acquires
    with writer_lock(
        d, owner="recovering", stale_after_s=3600, provider=provider
    ):
        pass
    # strict mode (stale_after_s=None) never steals
    assert provider.try_create(lock, "dead owner token=t1 t=0")
    _backdate(provider, lock, 7200)
    with pytest.raises(WriterLockHeld):
        with writer_lock(
            d, owner="strict", stale_after_s=None, provider=provider
        ):
            pass


def test_release_is_token_checked_new_holder_survives(
    tmp_path, provider
):
    """The r11 finding: a stolen lease's late release must leave the
    NEW holder's lock standing — exercised through the public
    primitive with a mismatched token."""
    d = str(tmp_path / "state")
    lock = os.path.join(d, ".writer.lock")
    os.makedirs(d, exist_ok=True)
    assert provider.try_create(lock, "holder-B pid=1 token=BBB t=0")
    # a zombie writer whose lease was stolen releases with ITS token
    provider.release_if_token(lock, "AAA")
    got = provider.read_holder(lock)
    assert got is not None and "token=BBB" in got[1]
    # the real holder's release still works
    provider.release_if_token(lock, "BBB")
    assert provider.read_holder(lock) is None


def test_heartbeat_keeps_live_writer_from_being_stolen(
    tmp_path, provider
):
    d = str(tmp_path / "slow")
    with writer_lock(
        d, owner="slow-but-alive", stale_after_s=1.0, provider=provider
    ):
        # heartbeat interval = 0.25s; sleep well past the stale
        # window — the heartbeats must keep the lease fresh
        time.sleep(2.2)
        with pytest.raises(WriterLockHeld, match="slow-but-alive"):
            with writer_lock(
                d, owner="waiter", stale_after_s=1.0, provider=provider
            ):
                pass
    # after release the dir is free
    with writer_lock(
        d, owner="next", stale_after_s=1.0, provider=provider
    ):
        pass


def test_concurrent_contenders_exactly_one_wins(tmp_path, provider):
    d = str(tmp_path / "race")
    results: list[str] = []
    mu = threading.Lock()

    def contend(name: str) -> None:
        try:
            with writer_lock(d, owner=name, provider=provider):
                with mu:
                    results.append(f"won:{name}")
                time.sleep(0.3)
        except WriterLockHeld:
            with mu:
                results.append(f"refused:{name}")

    ts = [
        threading.Thread(target=contend, args=(f"w{i}",))
        for i in range(4)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len([r for r in results if r.startswith("won:")]) == 1
    assert len([r for r in results if r.startswith("refused:")]) == 3


def _backdate(provider, lock: str, seconds: float) -> None:
    """Age a lock for staleness tests, per provider."""
    if isinstance(provider, PosixLockProvider):
        past = time.time() - seconds
        os.utime(lock, (past, past))
    else:
        provider._store.backdate(lock, seconds)


# ---------------------------------------------------------------
# provider-specific atomicity pins
# ---------------------------------------------------------------


def test_posix_create_crash_leaves_no_empty_body_lock(
    tmp_path, monkeypatch
):
    """ADVICE r11 #3: a crash between the exclusive create and the
    body write used to leave an EMPTY lock no token could ever
    release. With the link(2) shape the lock file either does not
    exist or carries its complete body."""
    prov = PosixLockProvider()
    lock = str(tmp_path / "dir" / ".writer.lock")
    os.makedirs(os.path.dirname(lock), exist_ok=True)

    real_write = os.write

    def crashing_write(fd, data):
        raise OSError("injected crash mid-body-write")

    monkeypatch.setattr(os, "write", crashing_write)
    with pytest.raises(OSError, match="injected"):
        prov.try_create(lock, "owner token=x t=0")
    monkeypatch.setattr(os, "write", real_write)
    # the half-created lock does NOT exist — the next writer wins
    assert not os.path.exists(lock)
    assert prov.try_create(lock, "owner token=y t=0")
    got = prov.read_holder(lock)
    assert got is not None and "token=y" in got[1]


def test_posix_yank_restore_when_steal_interleaves(tmp_path):
    """The release race itself (VERDICT r11 What's wrong #3): a
    steal+retake lands between release's pre-read and its rename.
    The yank-verify path must detect the foreign token on the file
    it now exclusively owns and RESTORE it — the new holder's lock
    survives byte-for-byte."""
    prov = PosixLockProvider()
    lock = str(tmp_path / ".writer.lock")
    # the new holder's lock is already in place; the zombie release
    # believes (from its stale pre-read) the lock is still its own
    # and calls the yank half directly with the OLD token
    assert prov.try_create(lock, "new-holder pid=2 token=NEW t=1")
    prov._yank_verify_delete(lock, "OLD")
    with open(lock) as f:
        assert "token=NEW" in f.read()
    # and no yank residue is left behind
    residue = [
        n
        for n in os.listdir(os.path.dirname(lock))
        if ".release-" in n or ".create-" in n
    ]
    assert residue == []


def test_objectstore_steal_loses_to_interleaved_heartbeat(tmp_path):
    """Stronger-than-POSIX property the generation condition buys:
    a steal that judged generation G stale must FAIL if the holder
    heartbeats (generation moves) before the delete lands."""
    store = FakeConditionalStore()
    holder = ObjectStoreLockProvider(store)
    waiter = ObjectStoreLockProvider(store)
    lock = "idx/.writer.lock"
    assert holder.try_create(lock, "owner pid=1 token=H t=0")
    store.backdate(lock, 7200)  # looks stale to the waiter...
    # ...but the holder heartbeats between the waiter's staleness
    # read and its delete: generation moves, last-modified refreshes
    observed = store.get(lock)
    holder.heartbeat(lock)
    assert not store.delete_if_generation(lock, observed[1])
    got = waiter.read_holder(lock)
    assert got is not None and got[0] < 3600  # fresh again


def test_objectstore_zombie_heartbeat_cannot_refresh_thiefs_lock():
    """After a steal+retake, the ORIGINAL holder's heartbeat must
    no-op (its held generation is gone), so a zombie writer cannot
    keep the thief's lock looking alive forever."""
    store = FakeConditionalStore()
    zombie = ObjectStoreLockProvider(store)
    thief = ObjectStoreLockProvider(store)
    lock = "idx/.writer.lock"
    assert zombie.try_create(lock, "owner pid=1 token=Z t=0")
    store.backdate(lock, 7200)
    thief.steal(lock, "tok")
    assert thief.try_create(lock, "owner pid=2 token=T t=1")
    thief_gen = store.get(lock)[1]
    zombie.heartbeat(lock)  # must not touch the thief's object
    assert store.get(lock)[1] == thief_gen
    # and the zombie's late release leaves the thief's lock standing
    zombie.release_if_token(lock, "Z")
    assert store.get(lock) is not None
