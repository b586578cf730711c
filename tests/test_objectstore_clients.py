"""Object-store adapter glue (r15 — VERDICT r14 What's missing #1):
the S3/GCS conditional-surface adapters, exercised against
CONTRACT-FAITHFUL local fakes of the real SDK surfaces — distinct
from ``statelock.FakeConditionalStore``, which fakes the four-method
contract itself; these fake the boto3 client and the
google-cloud-storage bucket, so the adapter code paths (header
choice, status classification, ETag salting, delete fallback) are
what runs.

The fakes reproduce the real stores' sharp edges on purpose:

- the S3 fake's ETags are CONTENT hashes (re-putting identical bytes
  yields the same ETag — the hazard the adapter's salt exists for)
  and its LastModified is truncated to whole seconds;
- the GCS fake's generations increment on every write and all four
  mutations honor ``if_generation_match``.

The full lease-protocol matrix from test_statelock is re-run over
``ObjectStoreLockProvider`` backed by each adapter (imported, not
copied). The S3 run EXCLUDES the sub-second-staleness heartbeat test:
second-granularity LastModified makes ``stale_after_s <= 1`` unusable
on S3 (documented in the adapter module); an S3-specific pin covers
the supported window instead.

When boto3 + moto are installed, ``pytest -m objectstore`` also runs
the contract set against a moto-backed real boto3 client — dormant in
this container (dependencies absent), alive on a first real deploy.
"""

from __future__ import annotations

import hashlib
import threading
import time
from datetime import datetime, timezone

import pytest

from etl_macropulse_br_spark.operators.objectstore_clients import (
    GCSConditionalStore,
    S3ConditionalStore,
)
from etl_macropulse_br_spark.operators.statelock import (
    ObjectStoreLockProvider,
    writer_lock,
)

# ----------------------------------------------------------------
# contract-faithful fake of the boto3 S3 client surface


class _FakeClientError(Exception):
    def __init__(self, status: int, code: str):
        super().__init__(f"{status} {code}")
        self.response = {
            "ResponseMetadata": {"HTTPStatusCode": status},
            "Error": {"Code": code},
        }


class _Body:
    def __init__(self, data: bytes):
        self._d = data

    def read(self) -> bytes:
        return self._d


class _FakeS3Client:
    """put_object/get_object/delete_object with S3's conditional
    semantics: ETag = content MD5 (identical bytes -> identical
    ETag), LastModified truncated to seconds, IfNoneMatch="*" and
    IfMatch honored, one mutex per 'store' for the per-key
    linearizability a real store gives. ``honor_delete_ifmatch``
    False emulates a classic general-purpose bucket that rejects
    the IfMatch header on DeleteObject."""

    def __init__(
        self,
        honor_delete_ifmatch: bool = True,
        ignore_delete_ifmatch: bool = False,
    ):
        self._objs: dict[str, tuple[bytes, str, float]] = {}
        self._mu = threading.Lock()
        self._honor_delete = honor_delete_ifmatch
        # r16 (ADVICE r15 #2): the third endpoint class — the header
        # is ACCEPTED but silently ignored, making every conditional
        # delete unconditional with no error to classify
        self._ignore_delete = ignore_delete_ifmatch

    @staticmethod
    def _etag(data: bytes) -> str:
        return hashlib.md5(data).hexdigest()

    def put_object(
        self, Bucket, Key, Body, IfNoneMatch=None, IfMatch=None
    ):
        with self._mu:
            cur = self._objs.get(Key)
            if IfNoneMatch == "*" and cur is not None:
                raise _FakeClientError(412, "PreconditionFailed")
            if IfMatch is not None:
                if cur is None:
                    raise _FakeClientError(404, "NoSuchKey")
                if cur[1] != IfMatch:
                    raise _FakeClientError(412, "PreconditionFailed")
            etag = self._etag(Body)
            self._objs[Key] = (Body, etag, float(int(time.time())))
            return {"ETag": f'"{etag}"'}

    def get_object(self, Bucket, Key):
        with self._mu:
            cur = self._objs.get(Key)
            if cur is None:
                raise _FakeClientError(404, "NoSuchKey")
            data, etag, mtime = cur
            return {
                "Body": _Body(data),
                "ETag": f'"{etag}"',
                "LastModified": datetime.fromtimestamp(
                    mtime, tz=timezone.utc
                ),
            }

    def delete_object(self, Bucket, Key, IfMatch=None):
        with self._mu:
            if IfMatch is not None and self._ignore_delete:
                IfMatch = None  # header silently dropped
            if IfMatch is not None and not self._honor_delete:
                raise _FakeClientError(400, "InvalidRequest")
            cur = self._objs.get(Key)
            if cur is None:
                raise _FakeClientError(404, "NoSuchKey")
            if IfMatch is not None and cur[1] != IfMatch:
                raise _FakeClientError(412, "PreconditionFailed")
            del self._objs[Key]
            return {}

    def _backdate(self, key: str, seconds: float) -> None:
        with self._mu:
            if key in self._objs:
                d, e, m = self._objs[key]
                self._objs[key] = (d, e, m - seconds)


# ----------------------------------------------------------------
# contract-faithful fake of the google-cloud-storage bucket surface


class _FakePreconditionFailed(Exception):
    code = 412


class _FakeNotFound(Exception):
    code = 404


class _FakeGCSBucket:
    def __init__(self):
        self._objs: dict[str, tuple[str, int, float]] = {}
        self._gen = 0
        self._mu = threading.Lock()

    def blob(self, name: str) -> "_FakeBlob":
        return _FakeBlob(self, name)

    def _backdate(self, key: str, seconds: float) -> None:
        with self._mu:
            if key in self._objs:
                d, g, m = self._objs[key]
                self._objs[key] = (d, g, m - seconds)


class _FakeBlob:
    def __init__(self, bucket: _FakeGCSBucket, name: str):
        self._b = bucket
        self._name = name
        self.generation: int | None = None
        self._updated: float | None = None

    def upload_from_string(self, data, if_generation_match=None):
        with self._b._mu:
            cur = self._b._objs.get(self._name)
            if if_generation_match is not None:
                if if_generation_match == 0:
                    if cur is not None:
                        raise _FakePreconditionFailed()
                elif cur is None or cur[1] != if_generation_match:
                    raise _FakePreconditionFailed()
            self._b._gen += 1
            self._b._objs[self._name] = (
                data,
                self._b._gen,
                time.time(),
            )
            self.generation = self._b._gen

    def delete(self, if_generation_match=None):
        with self._b._mu:
            cur = self._b._objs.get(self._name)
            if cur is None:
                raise _FakeNotFound()
            if (
                if_generation_match is not None
                and cur[1] != if_generation_match
            ):
                raise _FakePreconditionFailed()
            del self._b._objs[self._name]

    def reload(self):
        with self._b._mu:
            cur = self._b._objs.get(self._name)
            if cur is None:
                raise _FakeNotFound()
            self.generation = cur[1]
            self._updated = cur[2]

    def download_as_text(self, if_generation_match=None):
        with self._b._mu:
            cur = self._b._objs.get(self._name)
            if cur is None:
                raise _FakeNotFound()
            if (
                if_generation_match is not None
                and cur[1] != if_generation_match
            ):
                raise _FakePreconditionFailed()
            return cur[0]

    @property
    def updated(self):
        return datetime.fromtimestamp(self._updated, tz=timezone.utc)


# ----------------------------------------------------------------
# adapter stores with the test-only backdate hook the lease matrix
# uses (time manipulation lives in the FAKES; production adapters
# carry no test hooks)


class _S3Store(S3ConditionalStore):
    def backdate(self, key: str, seconds: float) -> None:
        self._c._backdate(self._key(key), seconds)


class _GCSStore(GCSConditionalStore):
    def backdate(self, key: str, seconds: float) -> None:
        self._bucket._backdate(f"{self._prefix}{key}", seconds)


def _s3_store() -> _S3Store:
    return _S3Store(_FakeS3Client(), "bkt", prefix="locks/")


def _gcs_store() -> _GCSStore:
    return _GCSStore(_FakeGCSBucket(), prefix="locks/")


@pytest.fixture(params=["s3", "gcs"])
def store(request):
    return {"s3": _s3_store, "gcs": _gcs_store}[request.param]()


# ----------------------------------------------------------------
# the four-method contract, through the adapters


def test_put_if_absent_one_winner(store):
    g1 = store.put_if_absent("k", "owner token=A t=1")
    assert g1 is not None
    assert store.put_if_absent("k", "owner token=B t=2") is None
    body, gen, mtime = store.get("k")
    assert body == "owner token=A t=1"  # S3: salt stripped on read
    assert gen == g1
    assert abs(mtime - time.time()) < 2.0


def test_put_if_generation_conditions_on_change(store):
    g1 = store.put_if_absent("k", "v1 token=A t=1")
    g2 = store.put_if_generation("k", "v2 token=A t=2", g1)
    assert g2 is not None and g2 != g1
    # stale generation: refused
    assert store.put_if_generation("k", "v3 token=A t=3", g1) is None
    # vanished key: refused
    assert store.delete_if_generation("k", g2) is True
    assert store.put_if_generation("k", "v4 token=A t=4", g2) is None


def test_delete_if_generation_one_winner(store):
    g1 = store.put_if_absent("k", "v token=A t=1")
    g2 = store.put_if_generation("k", "v token=A t=2", g1)
    assert store.delete_if_generation("k", g1) is False  # moved
    assert store.get("k") is not None  # live write survived
    assert store.delete_if_generation("k", g2) is True
    assert store.delete_if_generation("k", g2) is False  # gone
    assert store.get("k") is None


def test_s3_identical_body_reput_still_moves_generation():
    """The ETag hazard pin: a heartbeat re-puts the SAME logical
    body; on S3 the adapter's salt must still produce a fresh
    generation, or a stale-judged steal conditioned on the old
    generation would delete a LIVE holder's lock."""
    store = _s3_store()
    g1 = store.put_if_absent("k", "owner token=A t=1")
    g2 = store.put_if_generation("k", "owner token=A t=1", g1)
    assert g2 is not None and g2 != g1  # same bytes, new generation
    # and the protocol consequence: a steal conditioned on the
    # pre-heartbeat generation is refused
    assert store.delete_if_generation("k", g1) is False
    assert store.get("k")[0] == "owner token=A t=1"


def test_s3_delete_fallback_and_refusal():
    """Classic general-purpose buckets reject IfMatch on
    DeleteObject: default = loud NotImplementedError with guidance;
    opt-in fallback = get-compare-delete (documented TOCTOU)."""
    strict = _S3Store(
        _FakeS3Client(honor_delete_ifmatch=False), "bkt"
    )
    g = strict.put_if_absent("k", "v token=A t=1")
    with pytest.raises(NotImplementedError, match="IfMatch"):
        strict.delete_if_generation("k", g)
    assert strict.get("k") is not None  # nothing deleted

    lax = _S3Store(
        _FakeS3Client(honor_delete_ifmatch=False),
        "bkt",
        unconditional_delete_fallback=True,
    )
    g = lax.put_if_absent("k", "v token=A t=1")
    g2 = lax.put_if_generation("k", "v token=A t=2", g)
    assert lax.delete_if_generation("k", g) is False  # compare saw g2
    assert lax.delete_if_generation("k", g2) is True
    assert lax.get("k") is None


def test_s3_probe_classifies_all_three_endpoint_classes():
    """r16 (ADVICE r15 #2): honored / rejected are distinguishable
    from error statuses, but an endpoint that silently IGNORES
    IfMatch on DeleteObject looks exactly like success — only a
    probe with a deliberately mismatched ETag can tell. The probe
    must also leave no probe object behind."""
    for kwargs, want in (
        (dict(), "honored"),
        (dict(honor_delete_ifmatch=False), "rejected"),
        (dict(ignore_delete_ifmatch=True), "ignored"),
    ):
        client = _FakeS3Client(**kwargs)
        store = _S3Store(client, "bkt", prefix="locks/")
        assert store.probe_conditional_delete() == want, want
        assert not client._objs  # probe cleaned up


def test_s3_probe_cleans_up_on_unexpected_status():
    """r17 (ADVICE r16 #2): an endpoint answering the mismatched
    probe delete with an UNEXPECTED status (e.g. 503 SlowDown) used
    to leak the probe object through the re-raise; the cleanup now
    lives in a finally."""

    class _FlakyClient(_FakeS3Client):
        def delete_object(self, Bucket, Key, IfMatch=None):
            if IfMatch is not None:
                raise _FakeClientError(503, "SlowDown")
            return super().delete_object(Bucket, Key)

    client = _FlakyClient()
    store = _S3Store(client, "bkt", prefix="locks/")
    with pytest.raises(_FakeClientError, match="503"):
        store.probe_conditional_delete()
    assert not client._objs  # probe object cleaned up despite raise


def test_gcs_get_recovers_from_transient_churn():
    """r17 (ADVICE r16 #1): a lock rewritten a couple of times while
    get() snapshots it must be READ on a later backed-off attempt,
    not bubble the exhaustion error to lock acquire/release (whose
    callers retry nothing)."""
    losses = {"n": 0}

    class _BurstBlob(_FakeBlob):
        def download_as_text(self, if_generation_match=None):
            if losses["n"] < 2:
                losses["n"] += 1
                raise _FakePreconditionFailed()  # lost the race twice
            return super().download_as_text(if_generation_match=None)

    class _BurstBucket(_FakeGCSBucket):
        def blob(self, name):
            return _BurstBlob(self, name)

    bucket = _BurstBucket()
    store = GCSConditionalStore(bucket, prefix="locks/")
    bucket.blob("locks/k").upload_from_string("v", if_generation_match=0)
    body, gen, _ = store.get("k")
    assert (body, losses["n"]) == ("v", 2)


def test_s3_silently_ignoring_endpoint_cannot_delete_live_lock():
    """The hazard the probe exists for: on an ignoring endpoint the
    old adapter's conditional delete became unconditional, returned
    True, and a live holder's lock vanished with no error. Now the
    first delete probes the endpoint and routes through the same
    explicit fallback-or-raise gate as a rejecting endpoint."""
    client = _FakeS3Client(ignore_delete_ifmatch=True)
    strict = _S3Store(client, "bkt")
    g1 = strict.put_if_absent("k", "owner token=A t=1")
    g2 = strict.put_if_generation("k", "owner token=A t=2", g1)
    assert g2 is not None
    with pytest.raises(NotImplementedError, match="silently ignores"):
        strict.delete_if_generation("k", g1)
    assert strict.get("k")[0] == "owner token=A t=2"  # lock survived

    lax = _S3Store(
        _FakeS3Client(ignore_delete_ifmatch=True),
        "bkt",
        unconditional_delete_fallback=True,
    )
    g = lax.put_if_absent("k", "v token=A t=1")
    g2 = lax.put_if_generation("k", "v token=A t=2", g)
    assert lax.delete_if_generation("k", g) is False  # stale compare
    assert lax.get("k") is not None
    assert lax.delete_if_generation("k", g2) is True


def test_gcs_get_raises_on_snapshot_exhaustion_instead_of_none():
    """r16 (ADVICE r15 #3): a standing lock rewritten faster than
    the reload+download pair can snapshot it must NOT be reported
    with the same None that means 'absent' — read_holder/steal
    would misread a live lock as vanished. Distinct, retryable
    error instead."""

    class _ChurnBlob(_FakeBlob):
        def download_as_text(self, if_generation_match=None):
            raise _FakePreconditionFailed()  # always lost the race

    class _ChurnBucket(_FakeGCSBucket):
        def blob(self, name):
            return _ChurnBlob(self, name)

    bucket = _ChurnBucket()
    store = GCSConditionalStore(bucket, prefix="locks/")
    bucket.blob("locks/k").upload_from_string("v", if_generation_match=0)
    with pytest.raises(RuntimeError, match="consistent"):
        store.get("k")
    # absent keys still read as None, not as an error
    assert store.get("missing") is None


# ----------------------------------------------------------------
# the full lease-protocol matrix, re-run over each adapter
# (imported from test_statelock — the same assertions, not copies)

from tests import test_statelock as SL  # noqa: E402

_PROTOCOL_TESTS = [
    SL.test_exclusive_acquire_refuse_release_retake,
    SL.test_stale_lock_is_stolen_once,
    SL.test_release_is_token_checked_new_holder_survives,
    SL.test_concurrent_contenders_exactly_one_wins,
]


@pytest.mark.parametrize(
    "make_store", [_s3_store, _gcs_store], ids=["s3", "gcs"]
)
def test_lease_protocol_matrix_over_adapters(tmp_path, make_store):
    for i, fn in enumerate(_PROTOCOL_TESTS):
        prov = ObjectStoreLockProvider(make_store())
        fn(tmp_path / f"t{i}", prov)


def test_gcs_heartbeat_keeps_live_writer(tmp_path):
    # sub-second staleness works on GCS (microsecond timestamps)
    SL.test_heartbeat_keeps_live_writer_from_being_stolen(
        tmp_path, ObjectStoreLockProvider(_gcs_store())
    )


def test_s3_heartbeat_keeps_live_writer_at_supported_window(
    tmp_path,
):
    """S3's LastModified has SECOND granularity, so apparent lease
    age can overshoot by up to ~1 s — ``stale_after_s <= 1`` is
    unusable there (module docstring caveat). At a >=2 s window
    (beats every 0.5 s, worst apparent age ~1.5 s) a live holder is
    never judged stale."""
    prov = ObjectStoreLockProvider(_s3_store())
    d = str(tmp_path / "slow")
    from etl_macropulse_br_spark.operators.statelock import (
        WriterLockHeld,
    )

    with writer_lock(
        d, owner="slow-s3", stale_after_s=2.0, provider=prov
    ):
        time.sleep(2.6)
        with pytest.raises(WriterLockHeld, match="slow-s3"):
            with writer_lock(
                d, owner="waiter", stale_after_s=2.0, provider=prov
            ):
                pass
    with writer_lock(d, owner="next", stale_after_s=2.0, provider=prov):
        pass


@pytest.mark.parametrize(
    "make_store", [_s3_store, _gcs_store], ids=["s3", "gcs"]
)
def test_mutual_exclusion_stress_over_adapters(tmp_path, make_store):
    """The 6-thread contention stress over each adapter. Each
    make_pair() shares ONE fake backend (the stress replaces
    _store on all contenders with the dead holder's store)."""
    backend = make_store()

    def make_pair():
        return (
            ObjectStoreLockProvider(backend),
            ObjectStoreLockProvider(backend),
        )

    SL.test_mutual_exclusion_under_contention_and_steals(
        tmp_path, make_pair
    )


# ----------------------------------------------------------------
# real-SDK path: runs only under `pytest -m objectstore` with boto3
# + moto installed (absent in this container — dormant by design)

boto3 = pytest.importorskip  # alias to appease linters


@pytest.mark.objectstore
def test_s3_adapter_against_moto(tmp_path, monkeypatch):
    b3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")
    monkeypatch.chdir(tmp_path)  # catch stray local-dir creation
    with moto.mock_aws():
        client = b3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="lease-test-bucket")
        store = S3ConditionalStore(
            client, "lease-test-bucket", prefix="locks/"
        )
        g1 = store.put_if_absent("k", "owner token=A t=1")
        assert g1 is not None
        assert store.put_if_absent("k", "x token=B t=2") is None
        g2 = store.put_if_generation("k", "owner token=A t=1", g1)
        assert g2 is not None and g2 != g1
        assert store.delete_if_generation("k", g1) is False
        assert store.get("k")[0] == "owner token=A t=1"
        assert store.delete_if_generation("k", g2) is True
        assert store.get("k") is None

        # and the lease protocol end-to-end over the real client:
        # acquire -> refuse second writer -> release -> re-acquire
        from etl_macropulse_br_spark.operators.statelock import (
            WriterLockHeld,
        )

        prov = ObjectStoreLockProvider(store)
        with writer_lock("indexes/ann", owner="m1", provider=prov):
            with pytest.raises(WriterLockHeld, match="m1"):
                with writer_lock(
                    "indexes/ann", owner="m2", provider=prov
                ):
                    pass
        with writer_lock("indexes/ann", owner="m3", provider=prov):
            pass
        # object-store state dirs are KEY PREFIXES: no driver-local
        # directory may appear for them (r15 NEEDS_LOCAL_DIR pin)
        import os

        assert not os.path.exists(str(tmp_path / "indexes"))
