"""CAS lease crash-takeover fuzz (r06, VERDICT r05 item 6).

The in-process casmock test (test_manifest_segments) proves the
conditional-put lease adapter serializes threads and takes over one
hand-expired lease.  This test fuzzes the property that actually matters
for an object-store deployment: a commit holder SIGKILLed at a random
point — including while holding the lease, which (unlike flock) the
kernel does NOT release on death — must never wedge the root and never
let two committers land the same version.

Setup: a file-backed conditional-put store (one flock-bracketed
read-compare-replace per op — the mock of the store's server-side
atomicity) shared by N worker processes that run the REAL
``publish_commit`` + ``register_cas_commit_lock`` protocol on a
mock-scheme root, each commit sleeping inside the lease so kills land
mid-critical-section with high probability.  The parent kills a random
subset of workers at random times; survivors must complete every commit
(expired-lease takeover, never CommitLockTimeout), and afterwards the
version history must be strictly linear with every committed version
carrying exactly one worker's unique tag (no double-commit, no lost
update among recorded commits).

Short lease_ttl (1 s) >> the 20 ms in-lease critical section keeps the
protocol's "ttl must comfortably exceed the critical section" contract
while making post-crash takeover fast enough to fuzz.
"""

import fcntl
import hashlib
import json
import multiprocessing as mp
import os
import random
import signal
import time

import pytest

from bloomsearch_spark import IndexConfig
from bloomsearch_spark.sources import fs as fsx
from bloomsearch_spark.sources import manifest as mf

N_WORKERS = 5
N_VICTIMS = 3
COMMITS_PER_WORKER = 55  # 2 survivors alone = 110 racing commits
SCHEME = "caskill"
CFG_DICT = {"indexed_fields": ("content",)}


# ---------------------------------------------------------------------------
# file-backed conditional-put store: get/put_if with server-side atomicity
# (one flock around each op — what S3 If-Match / GCS generation preconditions
# guarantee remotely), shared across OS processes via the filesystem


def _key_paths(store_dir: str, path: str) -> tuple[str, str]:
    key = hashlib.sha1(path.encode()).hexdigest()
    return os.path.join(store_dir, key), os.path.join(store_dir, key + ".lk")


def _cas_get(store_dir: str, path: str):
    obj, lk = _key_paths(store_dir, path)
    fd = os.open(lk, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        if not os.path.exists(obj):
            return None, None
        with open(obj, "rb") as f:
            raw = f.read()
        ver, _, data = raw.partition(b"\n")
        return data, int(ver)
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _cas_put_if(store_dir: str, path: str, data: bytes, etag) -> bool:
    obj, lk = _key_paths(store_dir, path)
    fd = os.open(lk, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        cur_ver = None
        if os.path.exists(obj):
            with open(obj, "rb") as f:
                cur_ver = int(f.read().partition(b"\n")[0])
        if etag is None:
            if cur_ver is not None:
                return False
            new_ver = 1
        else:
            if cur_ver is None or cur_ver != etag:
                return False
            new_ver = cur_ver + 1
        tmp = obj + ".tmp"
        with open(tmp, "wb") as f:
            f.write(str(new_ver).encode() + b"\n" + data)
        os.replace(tmp, obj)
        return True
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _setup_scheme(store_dir: str, data_dir: str) -> None:
    """Per-process registration (spawn children start fresh): route the
    mock scheme's BYTES to a subtree of the local fs and its COMMIT LOCK
    to the CAS lease over the shared store."""
    from pyarrow import fs as pafs

    fsx.register_scheme(
        SCHEME, pafs.SubTreeFileSystem(data_dir, pafs.LocalFileSystem())
    )
    fsx.register_cas_commit_lock(
        SCHEME,
        lambda p: _cas_get(store_dir, p),
        lambda p, d, e: _cas_put_if(store_dir, p, d, e),
        lease_ttl=1.0,
        poll=0.005,
        timeout=120.0,
    )


def _commit_worker(
    store_dir: str, data_dir: str, wid: int, n: int, result_path: str
) -> None:
    _setup_scheme(store_dir, data_dir)
    cfg = IndexConfig(**CFG_DICT)
    root = f"{SCHEME}://idx"
    with open(result_path, "w") as out:
        for i in range(n):
            tag = f"w{wid}-c{i}"

            def fin(prev, tag=tag):
                v = mf.version_after(prev)
                # widen the in-lease window so a random SIGKILL lands
                # inside the critical section with high probability
                time.sleep(0.02)
                mf.write_meta(
                    fsx.join(root, "manifest", v), cfg,
                    extra={"tag": tag, "tables": {t: [] for t in mf.TABLES}},
                )
                return v

            v = mf.publish_commit(root, fin)
            out.write(json.dumps({"tag": tag, "version": v}) + "\n")
            out.flush()


@pytest.mark.slow
def test_cas_lease_crash_takeover_fuzz(tmp_path):
    rng = random.Random(0xC45)
    store_dir = str(tmp_path / "store")
    data_dir = str(tmp_path / "data")
    os.makedirs(store_dir)
    os.makedirs(data_dir)

    ctx = mp.get_context("spawn")
    procs, results = [], []
    for w in range(N_WORKERS):
        rp = str(tmp_path / f"w{w}.jsonl")
        results.append(rp)
        p = ctx.Process(
            target=_commit_worker,
            args=(store_dir, data_dir, w, COMMITS_PER_WORKER, rp),
        )
        procs.append(p)
        p.start()

    # kill victims at random points — mid-lease with high probability
    # (the 20 ms in-lease sleep dominates each commit's wall time)
    victims = rng.sample(range(N_WORKERS), N_VICTIMS)
    for vid in victims:
        time.sleep(rng.uniform(0.2, 0.8))
        if procs[vid].is_alive():
            os.kill(procs[vid].pid, signal.SIGKILL)
    for p in procs:
        p.join(timeout=300)
    survivors = [w for w in range(N_WORKERS) if w not in victims]
    # NEVER WEDGES: every surviving worker finished all its commits
    # (a stale dead-owner lease only delays by <= lease_ttl per takeover)
    for w in survivors:
        assert procs[w].exitcode == 0, (w, procs[w].exitcode)

    # and the root is still writable right now from this process
    _setup_scheme(store_dir, data_dir)
    try:
        root = f"{SCHEME}://idx"
        cfg = IndexConfig(**CFG_DICT)

        def fin(prev):
            v = mf.version_after(prev)
            mf.write_meta(
                fsx.join(root, "manifest", v), cfg,
                extra={"tag": "post-fuzz", "tables": {t: [] for t in mf.TABLES}},
            )
            return v

        final_v = mf.publish_commit(root, fin)
        cur = mf.current_version(root)
        assert cur == final_v

        # strictly linear committed history: v1..vCUR, one meta each.
        # (A victim killed between write_meta and the CURRENT swap leaves
        # an uncommitted orphan dir numbered past the then-CURRENT; every
        # later commit reuses/overwrites that number, so no orphan can
        # survive below the final CURRENT.)
        n_committed = int(cur[1:])
        mdir = os.path.join(data_dir, "idx", "manifest")
        committed = sorted(
            d for d in os.listdir(mdir)
            if d.startswith("v") and int(d[1:]) <= n_committed
        )
        assert committed == [f"v{i:08d}" for i in range(1, n_committed + 1)]

        # NO DOUBLE-COMMIT: every committed version carries exactly one
        # unique worker tag, and every commit a worker RECORDED landed at
        # the version it observed
        tags_by_version = {}
        for d in committed:
            with open(os.path.join(mdir, d, "meta.json")) as f:
                tags_by_version[d] = json.load(f)["tag"]
        tags = list(tags_by_version.values())
        assert len(set(tags)) == len(tags)  # a tag committed at most once

        recorded = 0
        for rp in results:
            if not os.path.exists(rp):
                continue
            with open(rp) as f:
                for line in f:
                    rec = json.loads(line)
                    assert tags_by_version.get(rec["version"]) == rec["tag"]
                    recorded += 1
        # survivors alone guarantee 2 * 25 recorded commits; victims add
        # whatever they landed before the kill
        assert recorded >= len(survivors) * COMMITS_PER_WORKER
        assert n_committed >= recorded  # plus unrecorded victim commits
    finally:
        fsx.unregister_commit_lock(SCHEME)
        fsx.unregister_scheme(SCHEME)
