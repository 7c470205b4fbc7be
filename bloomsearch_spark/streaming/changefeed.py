"""Index changefeed — the bloom index as a Structured Streaming SOURCE.

``spark.readStream.format("bloomsearch").option("root", ...)`` tails the
index's committed manifest versions and emits each BUILD commit's rows as
a micro-batch — the streaming third of the transparent surface (batch
read r04, batch write r04, streaming read r05).  This is the Delta/Iceberg
"table changefeed" pattern re-expressed over the delta-segment manifest:

- **offset** = committed manifest version number (versions are strictly
  linear — ``publish_commit`` serializes them), so offsets are total-ordered
  and replay-exact: ``partitions(start, end)`` is a pure function of the
  immutable version metadata.
- **micro-batch content**: for every version in ``(start, end]`` that is a
  BUILD commit (batch ``build_index`` append/overwrite, the DSv2 writer,
  a streaming-ingest batch), the blocks segments it ADDED relative to its
  predecessor are the commit's delta — O(batch) by the manifest design —
  and their data blocks are the emitted rows.  MAINTENANCE commits
  (merge/compact/expire/fold; identified by the ``parent_version`` meta
  key they all stamp) reorganize existing rows and emit NOTHING.
- **semantics**: an append-rows feed.  An ``overwrite`` commit emits its
  (fresh) rows; deletions (expire) are not represented — same contract as
  an append-only changefeed over a rewriting table.

Scale shape: the driver touches only meta.json files and the added
segments' ``data_path`` column (bounded by the BATCH, never the index);
row bytes flow executor-side in ``read()``.

Options beyond ``root``/``starting_version``/``blocks_per_task``:
- ``starting_timestamp`` (epoch seconds or ISO-8601, naive = UTC): start
  from the first commit at-or-after this instant (Delta
  ``startingTimestamp`` analog; mutually exclusive with
  ``starting_version``) — resolved against retained version metas'
  ``created_at`` in O(log n_versions) meta reads.
- ``change_events`` ("true"): full CDC mode — append a ``_change_type``
  string column ("insert" | "delete") and emit row-DELETING commits as
  events instead of refusing: an OVERWRITE becomes delete-the-old-table
  + insert-the-new, an EXPIRE becomes deletes of the expired blocks'
  rows (Delta CDF's change-row analog).  Delete rows are read from the
  REMOVED block dirs, which survive until vacuum — size the vacuums'
  ``retain_versions``/``retain_time`` to cover consumer lag, exactly as
  for time travel; a vacuumed delete source fails loudly at read.  The
  block-granular diff at a deleting commit costs O(both versions'
  manifests) driver-side — paid only at those rare versions, never on
  the append fast path.  APPLY CONVENTION (same as Delta CDF overwrite
  events): within one ``_commit_version``, apply deletes BEFORE inserts
  — an overwrite's old and new row sets can intersect, and
  insert-then-delete would wrongly drop the surviving keys.
- ``commit_metadata`` ("true"): append ``_commit_version`` (bigint — the
  manifest version number that committed each row) and
  ``_commit_timestamp`` (timestamp — that version meta's ``created_at``)
  — the CDC provenance columns (Delta CDF's ``_commit_version`` /
  ``_commit_timestamp`` analogs).
- ``max_versions_per_trigger`` (int): admit at most this many manifest
  versions per micro-batch (``maxFilesPerTrigger`` analog) — a feed
  catching up on a long-lived index streams its backlog in bounded
  batches instead of one giant first trigger.

Caveats (documented, enforced):
- versions between the stream's offset and CURRENT must still exist —
  ``vacuum_manifest`` deletes superseded version dirs, so don't vacuum
  a root a changefeed is still catching up on (missing version => loud
  error naming the version, never a silent gap);
- external (zero-copy) indexes are not exposed (their "rows" live in
  caller-owned files that may mutate); use the library search path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from ..sources import fs as fsx
from ..sources import manifest as mf


def _vnum(version: str | None) -> int:
    return int(version[1:]) if version else 0


def _vname(n: int) -> str:
    return f"v{n:08d}"


@dataclass
class _ChangeChunk(InputPartition):
    """One task's slice of a commit's new blocks (relative data dirs).
    ``version``/``ts_us`` are the committing manifest version number and
    its commit time (epoch microseconds, from the version meta's
    ``created_at``) — the values of the ``_commit_version`` /
    ``_commit_timestamp`` metadata columns when requested.  ``kind`` is
    the CDC event type ("insert" | "delete") — delete chunks point at
    the blocks a row-deleting commit REMOVED (still on disk until
    vacuum) and only arise with ``change_events``."""

    rel_paths: list
    version: int = 0
    ts_us: int = 0
    kind: str = "insert"


def _opt_bool(options: dict, key: str) -> bool:
    return str(options.get(key, "")).strip().lower() in ("true", "1", "yes")


class BloomSearchStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema) -> None:
        self.root = mf.root_option(options)
        if not self.root:
            raise ValueError(
                "bloomsearch stream requires .option('root', ...) or load(path)"
            )
        self.out_schema = schema
        self.blocks_per_task = int(options.get("blocks_per_task", "16"))
        self.with_meta = _opt_bool(options, "commit_metadata")
        self.with_events = _opt_bool(options, "change_events")
        mvpt = options.get("max_versions_per_trigger")
        self.max_versions = int(mvpt) if mvpt is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("max_versions_per_trigger must be >= 1")
        for snap_only in ("version", "timestamp_as_of"):
            if options.get(snap_only):
                raise ValueError(
                    f"{snap_only!r} pins a snapshot batch read — the "
                    "changefeed's start is set with starting_version / "
                    "starting_timestamp"
                )
        start = options.get("starting_version")
        start_ts = options.get("starting_timestamp")
        if start is not None and start_ts is not None:
            raise ValueError(
                "pass starting_version OR starting_timestamp, not both — "
                "they both set the stream's initial offset"
            )
        cur = mf.current_version(self.root)
        if cur is not None:
            meta = self._meta(cur)
            if meta.get("external"):
                raise ValueError(
                    "external (zero-copy) indexes have no changefeed — their "
                    "rows live in caller-owned source files; use "
                    "bloomsearch_spark.search()"
                )
        if start_ts is not None:
            # Delta startingTimestamp semantics: commits at-or-after the
            # instant are included.  Offsets are exclusive-from, so the
            # initial offset is the PRECEDING version number — whose meta
            # partitions() needs for delta computation; refuse upfront if
            # it was vacuumed rather than fail on the first trigger.
            if cur is None:
                raise ValueError(
                    f"no committed manifest under {self.root} — cannot "
                    "resolve starting_timestamp"
                )
            first = mf.first_version_at_or_after(self.root, start_ts)
            if first is None:
                raise ValueError(
                    f"starting_timestamp {start_ts!r} is after the latest "
                    f"commit ({cur}) — nothing committed at-or-after it; "
                    "use .option('starting_version', 'latest') to tail "
                    "only future commits"
                )
            n = _vnum(first)
            if n > 1 and not fsx.exists(
                fsx.join(self.root, "manifest", _vname(n - 1), "meta.json")
            ):
                raise ValueError(
                    f"starting_timestamp resolves to {first}, but its "
                    f"predecessor {_vname(n - 1)} was vacuumed — the feed "
                    "cannot compute the first delta; start from a later "
                    "timestamp or a retained starting_version"
                )
            self._initial = n - 1
        elif start is None or start == "earliest":
            self._initial = 0
        elif start == "latest":
            self._initial = _vnum(cur)
        else:
            self._initial = _vnum(str(start)) if str(start).startswith("v") else int(start)
        # admission-control floor: the highest offset this READER instance
        # knows the stream has reached (advanced by latestOffset's own
        # returns and by every partitions() range Spark actually plans)
        self._floor = self._initial

    # -- offsets (driver) ---------------------------------------------------

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        cur = _vnum(mf.current_version(self.root))
        if self.max_versions is None:
            return {"version": cur}
        # cap versions admitted per trigger (maxFilesPerTrigger analog): a
        # changefeed catching up on a long-lived index must not emit its
        # whole backlog as ONE giant micro-batch.  The floor is this
        # instance's knowledge, not the checkpoint (Spark never shows the
        # reader its committed offset): after a restart the first triggers
        # may return already-committed offsets — Spark plans no batch for
        # those, each return still advances the floor by the cap, so the
        # stream ramps to the checkpoint in O(committed/cap) empty triggers
        # and is exact from the first planned batch on.
        hi = min(cur, self._floor + self.max_versions)
        self._floor = max(self._floor, hi)
        return {"version": hi}

    # -- planning (driver) --------------------------------------------------

    def _meta(self, version: str) -> dict:
        import json

        try:
            return json.loads(
                fsx.read_bytes(
                    fsx.join(self.root, "manifest", version, "meta.json")
                )
            )
        except FileNotFoundError:
            raise RuntimeError(
                f"changefeed needs manifest version {version} of {self.root}, "
                "which no longer exists — it was vacuumed while this stream "
                "was behind.  Restart the stream from a retained version "
                "(.option('starting_version', ...)), and do not run "
                "vacuum_manifest on roots with lagging changefeeds"
            ) from None

    @staticmethod
    def _blocks_refs(meta: dict, version: str) -> list[str]:
        tables = meta.get("tables")
        if tables is None:
            # pre-segment (legacy) manifest: its blocks.parquet is a FULL
            # SNAPSHOT, so "added refs" would re-emit the whole index per
            # legacy version (and legacy maintenance commits carry no
            # parent_version marker) — refuse rather than duplicate rows
            raise RuntimeError(
                f"changefeed requires the segmented manifest: version "
                f"{version} is a pre-segment snapshot commit.  Start the "
                "stream from the first segmented version "
                "(.option('starting_version', ...)) or rebuild the index"
            )
        return list(tables.get("blocks") or [])

    def _segment_data_paths(self, refs: list[str]) -> list[str]:
        """data_path column of the given blocks-segment files — O(commit
        batch) rows by the delta-manifest design."""
        import pyarrow.dataset as pads

        out: list[str] = []
        for rel in refs:
            fs, local = fsx.resolve(fsx.join(self.root, "manifest", rel))
            ds = pads.dataset(local, format="parquet", filesystem=fs)
            for batch in ds.to_batches(columns=["data_path"]):
                out.extend(batch.column("data_path").to_pylist())
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        self._floor = max(self._floor, hi)  # see latestOffset
        if hi <= lo:
            return []
        prev_refs: set[str] = (
            set(self._blocks_refs(self._meta(_vname(lo)), _vname(lo)))
            if lo > 0
            else set()
        )
        per_version: list[tuple[int, int, list[str], str]] = []

        def removed_paths(refs: list[str]) -> list[str]:
            # block-granular diff for a row-DELETING commit: the prior
            # version's data dirs no longer referenced.  O(both versions'
            # manifests) driver-side — paid only at the rare
            # overwrite/expire versions, never on the append fast path.
            prev_all = set(self._segment_data_paths(sorted(prev_refs)))
            return sorted(prev_all - set(self._segment_data_paths(refs)))

        for n in range(lo + 1, hi + 1):
            v = _vname(n)
            meta = self._meta(v)
            refs = self._blocks_refs(meta, v)
            ts_us = int(float(meta.get("created_at") or 0.0) * 1e6)
            if meta.get("parent_version") is None:
                # BUILD commit: its delta = the segments it added
                added = [r for r in refs if r not in prev_refs]
                if prev_refs - set(refs) and n - 1 != self._initial:
                    # an OVERWRITE replaced the table.  With
                    # change_events on, emit it as Delta-CDF-style
                    # delete-the-old + insert-the-new rows; without,
                    # replaying it as a plain delta would silently leave
                    # a downstream replica with old + new rows, so
                    # refuse loudly — UNLESS the consumer started
                    # exactly at the overwrite (initial offset n-1),
                    # the explicit full-refresh opt-in: its first batch
                    # IS the rewritten table.
                    if not self.with_events:
                        raise RuntimeError(
                            f"manifest version v{n:08d} is an OVERWRITE "
                            "(it drops its predecessor's segments) — the "
                            "changefeed is append-only and has no "
                            "delete/truncate events, so replaying it as a "
                            "delta would corrupt any downstream replica.  "
                            "Either read CDC events "
                            "(.option('change_events', 'true') adds a "
                            "_change_type column and emits the dropped "
                            "rows as deletes), or treat the overwrite as "
                            "a full refresh: reset the downstream state, "
                            "then restart the feed with "
                            f".option('starting_version', {n - 1}) and a "
                            "FRESH checkpoint (batch reads: "
                            f".option('changes_from', {n - 1})) — "
                            "starting exactly there emits the rewritten "
                            "table as the first batch"
                        )
                    per_version.append((n, ts_us, removed_paths(refs), "delete"))
                per_version.append(
                    (n, ts_us, self._segment_data_paths(added), "insert")
                )
            elif str(meta.get("source_desc") or "").startswith("expire"):
                # expire is the ONE maintenance op that DELETES rows —
                # skipping it silently (like merge/compact/fold, which
                # merely reorganize) would leave a replica holding the
                # expired rows forever.  With change_events on, emit the
                # dropped blocks as delete rows; without, refuse
                # (conservatively even when the expiry matched nothing —
                # the meta doesn't record row deltas).
                if not self.with_events:
                    raise RuntimeError(
                        f"manifest version v{n:08d} is an EXPIRE commit — "
                        "it deletes rows, and the plain changefeed has no "
                        "delete events to carry that; a replica fed past "
                        "it would silently keep the expired rows.  Either "
                        "read CDC events (.option('change_events', "
                        "'true') adds a _change_type column and emits the "
                        "expired rows as deletes), or re-seed the "
                        "downstream state from a snapshot read "
                        f"(optionally .option('version', 'v{n:08d}')) and "
                        "restart the feed with "
                        f".option('starting_version', {n}) and a fresh "
                        "checkpoint"
                    )
                per_version.append((n, ts_us, removed_paths(refs), "delete"))
            # other maintenance commits emit nothing (rows merely
            # reorganized: merge / compact / fold)
            prev_refs = set(refs)
        k = max(1, self.blocks_per_task)
        return [
            _ChangeChunk(
                rel_paths=paths[i : i + k], version=n, ts_us=ts, kind=kind
            )
            for n, ts, paths, kind in per_version
            for i in range(0, len(paths), k)
        ]

    # -- executor side ------------------------------------------------------

    def read(self, partition: _ChangeChunk):
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        names = [f.name for f in self.out_schema.fields]
        meta_names = ("_commit_version", "_commit_timestamp", "_change_type")
        data_names = [n for n in names if n not in meta_names]
        arrow_schema = to_arrow_schema(self.out_schema)
        data_dir = fsx.join(self.root, "data")
        for rel in partition.rel_paths:
            try:
                tbl = fsx.read_parquet_dir(fsx.join(data_dir, rel))
            except Exception as e:
                # historical sources (an old version's inserts, a deleting
                # commit's removed dirs) disappear under the DATA vacuum;
                # surface the lag/retention diagnosis instead of a bare
                # FileNotFound (the original error stays chained)
                raise RuntimeError(
                    f"changefeed {partition.kind} source {rel!r} (version "
                    f"v{partition.version:08d}) is unreadable — most "
                    "likely vacuumed while this consumer lagged.  "
                    "Historical rows live in block dirs only until "
                    "vacuum; size vacuum's retain_versions/retain_time "
                    "to cover consumer lag, or re-seed downstream from a "
                    "snapshot and restart the feed past this version"
                ) from e
            if len(tbl):
                # project arrow-side — an old commit written under a
                # narrower schema gets null columns rather than KeyError.
                # No pandas round-trip: ``Table.from_pandas`` would
                # corrupt every stored float NaN to NULL (pandas null
                # sentinel), changing the rows the feed emits.
                out = pa.Table.from_arrays(
                    [
                        tbl[n]
                        if n in tbl.column_names
                        else pa.nulls(len(tbl), arrow_schema.field(n).type)
                        for n in data_names
                    ],
                    names=data_names,
                )
                if self.with_meta:
                    out = out.append_column(
                        "_commit_version",
                        pa.array([partition.version] * len(out), pa.int64()),
                    ).append_column(
                        "_commit_timestamp",
                        # epoch-us ints labelled UTC: the final cast to the
                        # session-tz arrow type relabels the same instant
                        pa.array(
                            [partition.ts_us] * len(out),
                            pa.timestamp("us", tz="UTC"),
                        ),
                    )
                if self.with_events:
                    out = out.append_column(
                        "_change_type",
                        pa.array([partition.kind] * len(out), pa.string()),
                    )
                yield from out.cast(arrow_schema).to_batches()
