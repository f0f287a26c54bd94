"""Reference-parity ETL tests (SURVEY.md §5.2 engine-local additions).

The reference ships no tests (SURVEY.md §5.1); these encode its
documented semantics: NextSong filter, dimension dedup rules, the
time-dim derivation, the natural-key fact join, partitioned layout.
Fixture JSON is generated per-test (tiny, deterministic) — the
driver's testdata has no song/log JSON, and ETL inputs are the one
place test-local fixtures are appropriate.
"""

from __future__ import annotations

import json
import os

import pytest

from data_lake_with_spark_and_aws_s3_spark.etl import run_pipeline

SONGS = [
    {"num_songs": 1, "artist_id": "A1", "artist_latitude": 35.0, "artist_longitude": -90.0,
     "artist_location": "Memphis", "artist_name": "Elvis", "song_id": "S1",
     "title": "Hound Dog", "duration": 136.0, "year": 1956},
    {"num_songs": 1, "artist_id": "A2", "artist_latitude": None, "artist_longitude": None,
     "artist_location": "", "artist_name": "Nina", "song_id": "S2",
     "title": "Feeling Good", "duration": 177.0, "year": 1965},
    # exact duplicate record (dedup must collapse it)
    {"num_songs": 1, "artist_id": "A1", "artist_latitude": 35.0, "artist_longitude": -90.0,
     "artist_location": "Memphis", "artist_name": "Elvis", "song_id": "S1",
     "title": "Hound Dog", "duration": 136.0, "year": 1956},
]


def _log(ts, user, song, artist, page="NextSong", level="free", session=1):
    return {
        "artist": artist, "auth": "Logged In", "firstName": f"F{user}",
        "gender": "F", "itemInSession": 0, "lastName": f"L{user}",
        "length": 100.0, "level": level, "location": "X", "method": "PUT",
        "page": page, "registration": 1.0, "sessionId": session, "song": song,
        "status": 200, "ts": ts, "userAgent": "ua", "userId": str(user),
    }


LOGS = [
    _log(1541990000000, 1, "Hound Dog", "Elvis"),
    _log(1541990060000, 1, "Feeling Good", "Nina", level="paid", session=2),
    _log(1541990120000, 2, "Unknown Song", "Nobody"),      # no song match -> null song_id
    _log(1541990180000, 2, "Hound Dog", "Elvis", page="Home"),  # filtered out
]


@pytest.fixture(scope="module")
def etl_out(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sparkify")
    inp, outp = root / "input", root / "output"
    song_dir = inp / "song_data" / "A" / "A" / "A"
    log_dir = inp / "log_data" / "2018" / "11"
    os.makedirs(song_dir), os.makedirs(log_dir)
    for i, rec in enumerate(SONGS):
        (song_dir / f"s{i}.json").write_text(json.dumps(rec))
    (log_dir / "events.json").write_text("\n".join(json.dumps(r) for r in LOGS))
    tables = run_pipeline(spark, str(inp), str(outp))
    return str(outp), tables


def test_songs_dim(spark, etl_out):
    outp, _ = etl_out
    songs = spark.read.parquet(f"{outp}/songs")
    rows = {r["song_id"]: r for r in songs.collect()}
    assert set(rows) == {"S1", "S2"}  # duplicate S1 collapsed
    assert rows["S1"]["title"] == "Hound Dog"
    # partition columns survive the roundtrip (year, artist_id layout)
    assert {f.name for f in songs.schema.fields} == {
        "song_id", "title", "duration", "year", "artist_id"
    }
    # physical layout is partitioned: year=.../artist_id=... directories
    assert any(p.startswith("year=") for p in os.listdir(f"{outp}/songs"))


def test_artists_dim(spark, etl_out):
    outp, _ = etl_out
    artists = spark.read.parquet(f"{outp}/artists")
    rows = {r["artist_id"]: r for r in artists.collect()}
    assert set(rows) == {"A1", "A2"}
    assert rows["A1"]["name"] == "Elvis"
    assert rows["A2"]["latitude"] is None


def test_users_latest_level(spark, etl_out):
    outp, _ = etl_out
    users = spark.read.parquet(f"{outp}/users")
    rows = {r["user_id"]: r for r in users.collect()}
    # user 1 upgraded free -> paid; latest row wins
    assert rows["1"]["level"] == "paid"
    # user 2's only NextSong row counts; the Home row is excluded
    assert set(rows) == {"1", "2"}


def test_time_dim(spark, etl_out):
    outp, _ = etl_out
    time_dim = spark.read.parquet(f"{outp}/time")
    rows = time_dim.collect()
    assert len(rows) == 3  # three distinct NextSong timestamps
    r = {int(x["start_time"].timestamp() * 1000): x for x in rows}[1541990000000]
    assert (r["year"], r["month"], r["day"]) == (2018, 11, 12)
    assert r["hour"] == 2  # 2018-11-12T02:33:20Z (session tz = UTC)


def test_songplays_fact(spark, etl_out):
    outp, _ = etl_out
    sp = spark.read.parquet(f"{outp}/songplays").orderBy("songplay_id").collect()
    assert len(sp) == 3  # NextSong rows only
    ids = [r["songplay_id"] for r in sp]
    # surrogate key: unique, deterministic (pure function of the
    # natural key), strictly increasing in event order
    assert len(set(ids)) == 3 and ids == sorted(ids)
    ts_order = [r["songplay_id"] for r in sorted(sp, key=lambda r: (r["start_time"], r["session_id"]))]
    assert ts_order == ids
    by_user = {}
    for r in sp:
        by_user.setdefault(r["user_id"], []).append(r)
    # natural-key join resolved both known songs; unknown song -> null
    assert {r["song_id"] for r in by_user["1"]} == {"S1", "S2"}
    assert by_user["2"][0]["song_id"] is None


def test_idempotent_overwrite(spark, etl_out):
    outp, tables = etl_out
    # re-running must not duplicate rows (mode=overwrite semantics)
    before = spark.read.parquet(f"{outp}/songplays").count()
    from data_lake_with_spark_and_aws_s3_spark.etl import process_log_data

    inp = outp.replace("/output", "/input")
    process_log_data(spark, inp, outp)
    after = spark.read.parquet(f"{outp}/songplays").count()
    assert before == after


def test_small_files_control_file_count(spark):
    """coalesce(4) on write must produce exactly 4 data files."""
    import glob

    from data_lake_with_spark_and_aws_s3_spark.operators import sinks
    from data_lake_with_spark_and_aws_s3_spark.registry import REGISTRY

    REGISTRY["q_small_files_control"].fn(spark, "/root/testdata/sf0.01").collect()
    roots = sorted(glob.glob(f"{sinks._SCRATCH}/orders_coalesced_*/orders_coalesced"))
    assert roots, "sink did not write"
    files = glob.glob(f"{roots[-1]}/part-*.parquet")
    assert len(files) == 4, f"expected 4 coalesced files, found {len(files)}"
