"""MBTiles (SQLite) tile sink (K4; ref scripts/download_nationalmap/
create_nationalmap_mbtiles.py:92-199).

SQLite is single-writer, so the scalable shape is: each partition
writes its own shard file (parallel, no lock contention), then the
driver merges shards into the final MBTiles with one sequential
pass — the merge moves already-encoded blobs, not pixels. Matches
the reference's behavior: unique index on (z, x, y), TMS y-flip
(:104,172-174), batched commits (:197-198), skip-existing resume
(:86-99 → INSERT OR IGNORE).
"""

from __future__ import annotations

import os
import shutil
import sqlite3
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row

_SCHEMA_SQL = (
    "CREATE TABLE IF NOT EXISTS tiles (zoom_level INTEGER, tile_column INTEGER,"
    " tile_row INTEGER, tile_data BLOB);"
    "CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles"
    " (zoom_level, tile_column, tile_row);"
    "CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT);"
)


def _ensure_metadata_index(con: sqlite3.Connection) -> None:
    """Create the unique (name) index on metadata, healing legacy files
    first: earlier versions did plain INSERT, so a resumed re-run could
    leave duplicate metadata names — creating the unique index over
    those would raise IntegrityError on exactly the artifacts the
    REPLACE upsert is meant to repair. Keep the newest row per name
    (max rowid = last written), drop the rest, then index."""
    con.execute(
        "DELETE FROM metadata WHERE rowid NOT IN"
        " (SELECT MAX(rowid) FROM metadata GROUP BY name)"
    )
    con.execute("CREATE UNIQUE INDEX IF NOT EXISTS metadata_name ON metadata (name)")


def _write_shard(shard_dir: str, batch_size: int):
    def fn(rows: Iterator[Row]) -> Iterator[Row]:
        import uuid

        path = os.path.join(shard_dir, f"shard-{uuid.uuid4().hex}.sqlite")
        con = sqlite3.connect(path)
        con.executescript(_SCHEMA_SQL)
        pending = 0
        wrote = 0
        for r in rows:
            tms_y = (2**r.z - 1) - r.y  # TMS y-flip (ref :104)
            con.execute(
                "INSERT OR IGNORE INTO tiles (zoom_level, tile_column, tile_row, tile_data)"
                " VALUES (?, ?, ?, ?)",
                (int(r.z), int(r.x), int(tms_y), bytes(r.data)),
            )
            pending += 1
            wrote += 1
            if pending >= batch_size:  # batched commits (ref :197-198)
                con.commit()
                pending = 0
        con.commit()
        con.close()
        if wrote == 0:
            os.remove(path)
        yield Row(shard=path, tiles=wrote)

    return fn


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    *,
    metadata: dict[str, str] | None = None,
    batch_size: int = 10,
) -> int:
    """Write a (z, x, y, data) DataFrame to an MBTiles file.

    Returns the tile count. Parallel shard write via mapPartitions →
    sequential driver-side merge (INSERT OR IGNORE keeps first-writer-
    wins semantics for duplicate keys, matching the reference's
    skip-existing resume).

    Throughput ceiling: the final merge is inherently single-writer
    (one SQLite file), so driver disk bandwidth bounds the sink at
    ~encoded-blob copy speed. That is the MBTiles format's contract,
    not a plan flaw — for unbounded tile sets, shard the OUTPUT
    (one MBTiles per region/zoom) instead of asking one file to
    absorb a cluster's write rate.

    Deployment contract: ``path`` must be a filesystem visible to BOTH
    executors and driver — local disk in local mode (this sandbox), a
    shared mount (NFS/FUSE-mounted object store) on a cluster. On a
    multi-node cluster without a shared mount the shard handoff cannot
    work (tasks write local files the driver can't ATTACH); stage
    shards through shared storage or run the sink in a single-node
    job, exactly as the reference's single-process script does.
    """
    shard_dir = path + ".shards"
    os.makedirs(shard_dir, exist_ok=True)
    shard_rows = tiles.select("z", "x", "y", "data").rdd.mapPartitions(_write_shard(shard_dir, batch_size)).collect()

    con = sqlite3.connect(path)
    con.executescript(_SCHEMA_SQL)
    _ensure_metadata_index(con)
    total = 0
    # merge ONLY the shards the successful tasks reported — a failed/
    # retried or speculative task can leave a partial shard file in
    # the dir, and ATTACHing it would risk merging stale/corrupt data
    committed = sorted(r["shard"] for r in shard_rows if r["tiles"] > 0)
    for shard in committed:
        con.execute("ATTACH DATABASE ? AS shard", (shard,))
        con.execute("INSERT OR IGNORE INTO tiles SELECT * FROM shard.tiles")
        con.commit()
        con.execute("DETACH DATABASE shard")
        os.remove(shard)
    # unlisted leftovers (from task retries) are garbage — clean them,
    # tolerating a zombie attempt still dropping files (the merge is
    # already complete and correct; cleanup must not fail the write)
    shutil.rmtree(shard_dir, ignore_errors=True)
    # REPLACE keeps metadata single-valued per key across resume
    # re-runs (the tiles side gets the same via INSERT OR IGNORE +
    # the unique index; re-running with new metadata updates it)
    for k, v in (metadata or {}).items():
        con.execute("INSERT OR REPLACE INTO metadata (name, value) VALUES (?, ?)", (k, v))
    con.commit()
    (total,) = con.execute("SELECT count(*) FROM tiles").fetchone()
    con.close()
    return int(total)
