"""Fast oracle-conformance subset at sf0.001 (the driver runs the full suite
at sf0.01; scripts/check_queries.py reproduces that locally)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "q01_pricing_summary",
    "q04_top_orders",
    "q07_events_hourly",
    "q08_sessions",
    "q09_dedup_exact",
    "q10_text_stats",
    "q12_tile_counts",
    "q13_cell_hotspots",
    "q15_knn",
    "q41_inverted_index",
    "q42_event_props_stats",
    "q43_source_profile",
    "q44_token_windows",
    "q45_doc_deciles",
    "q47_box_range_join",
    "q50_nearest_station",
    "q91_web_curation",
    "q106_geo_isolates",
    "q107_covisits",
    "q108_segment_crossings",
    "q109_idw",
    "q110_morans_i",
    "q111_areal_interp",
    "q112_dbscan",
    "q113_event_pivot",
    "q114_group_quantiles",
    "q115_anomaly_days",
    "q116_host_kcore",
    "q117_burst_starts",
    "q118_move_octants",
    "q119_split_assign",
    "q120_balance_weights",
    "q121_tile_lang_mix",
    "q122_cell_trends",
    "q123_distance_spectrum",
    "q124_od_matrix",
    "q125_mobility_stats",
    "q126_home_cell",
    "q127_gistar_hotspots",
    "q128_stay_points",
    "q129_bigram_surprisal",
    "q130_geary_c",
    "q131_kmeans",
    "q132_redirect_chains",
    "q133_cocitation",
    "q134_hits",
    "q135_jsonl_roundtrip",
    "q136_heavy_hitters",
    "q138_traj_similarity",
    "q139_bfs_hops",
    "q140_adaptive_tiles",
    "q141_crawl_budget",
    "q142_dwell_time",
    "q143_cell_flows",
    "q144_raster_regions",
    "q145_ppr",
    "q146_lat_bands",
    "q147_csv_roundtrip",
    "q148_ewma_cells",
    "q149_basket_pairs",
    "q150_incremental_tiles",
    "q151_cluster_quality",
    "q152_global_rank",
    "q153_skyline",
    "q154_distance_transform",
    "q155_rendezvous",
    "q156_chi2_contingency",
    "q157_host_gini",
    "q158_benford",
    "q159_daily_autocorr",
    "q160_weighted_median",
    "q161_global_rank_sampled",
    "q162_nearest_facility",
    "q163_pmi_collocations",
    "q164_host_reservoir",
    "q165_weighted_paths",
    "q166_cell_diameter",
    "q167_dup_ngram_coverage",
    "q168_ipc_roundtrip",
    "q169_cusum_changepoint",
    "q170_bpe_pairs",
    "q171_degree_assortativity",
    "q172_flow_accumulation",
    "q173_segment_box_join",
    "q174_coverage_curve",
    "q175_winsorized_stats",
    "q176_and_search",
    "q177_containment_join",
    "q178_interval_union",
    "q179_tile_pack",
    "q180_dedup_savings",
    "q181_colocation_patterns",
    "q182_rolling_distinct",
    "q184_pushdown_scan",
    "q185_cell_ls_trend",
    "q186_cohort_retention",
    "q187_prefix_completions",
    "q188_mad",
    "q189_hilbert_range",
    "q190_gap_stats",
    "q191_bilinear_upsample",
    "q192_bounce_rate",
    "q193_district_centroids",
    "q194_top_movers",
    "q195_hash_ring",
    "q196_funnel_latency",
    "q197_kwic",
    "q198_threshold_runs",
    "q199_phrase_count",
    "q200_geo_curation",
    "q201_watermark_late",
    "q202_focal_smooth",
    "q203_dow_heatmap",
    "q205_moving_sum",
    "q206_pk_audit",
    "q207_fk_audit",
    "q208_domain_audit",
    "q209_clustering_coeff",
    "q210_lang_homophily",
    "q211_depth_quality_corr",
    "q212_attribution",
    "q213_growth_accounting",
    "q214_rfm",
    "q215_hist_equalize",
    "q216_audience_overlap",
    "q217_ship_delay",
    "q218_trade_matrix",
    "q219_supplier_hhi",
    "q220_district_terms",
    "q221_forecast_backtest",
    "q222_sortmerge_join",
    "q223_nation_share",
    "q227_band_join",
    "q228_survival",
    "q230_slope_zonal",
    "q231_viewshed",
    "q235_hex_cells",
    "q237_cogroup_orders",
    "q239_rasterize_traj",
    "q240_audio_tones",
    "q243_upsert_latest",
    "q246_image_dups",
    "q247_scene_change",
    "q250_asof_nearest",
    "q252_geofence_enters",
    "q253_haar_levels",
    "q255_twohop_reach",
    "q257_substring_dedup",
    "q258_cms_freq",
    "q259_als_rank1",
    "q260_apriori_triples",
    "q261_scd2_intervals",
    "q262_dict_scan",
    "q263_embed_gram",
    "q264_rrf_fusion",
    "q265_full_outer_daily",
    "q266_k_anonymity",
    "q267_hash_walks",
    "q268_grouped_moments",
    "q269_greedy_cover",
    "q270_model_score",
    "q271_negative_samples",
    "q272_span_corruption",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con):
    from oma_ray.pipelines.queries import ORACLES, QUERIES

    got = QUERIES[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = canon(got)
    want = canon(con.sql(ORACLES[name]).df())
    assert len(got) == len(want), (len(got), len(want))
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype == object or w.dtype == object:
            assert (g.astype(str) == w.astype(str)).all(), c
        else:
            assert (g == w).all(), c


@pytest.mark.parametrize(
    "name", ["q03_topk_revenue", "q04_top_orders", "q13_cell_hotspots"]
)
def test_bounded_topk_has_no_global_sort(name):
    """VERDICT r4 #1: bounded top-k must use the partial-top-k fold, not a
    full range-partition sort — assert on the executed plan string."""
    from oma_ray.pipelines.queries import QUERIES

    ds = QUERIES[name](SF)
    ds = ds.materialize()
    plan = ds.stats()
    assert "Sort" not in plan, plan
    assert len(ds.to_pandas()) > 0


@pytest.mark.parametrize("name,kw", [
    ("q132_redirect_chains", {"driver_max_nodes": 0}),
    ("q139_bfs_hops", {"driver_max_edges": 0}),
    ("q267_hash_walks", {"driver_max_edges": 0}),
])
def test_iterative_graph_forced_distributed_parity(name, kw, con):
    """q132/q139 dual regime (round 5): the driver-side numpy fold is the
    small-scale fast path; force the gate to 0 so the keyed-exchange
    iteration runs, and pin it to the same oracle."""
    from oma_ray.pipelines.queries import ORACLES, QUERIES

    got = canon(QUERIES[name](SF, **kw).to_pandas())
    want = canon(con.sql(ORACLES[name]).df())
    assert len(got) == len(want), (len(got), len(want))
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype == object or w.dtype == object:
            assert (g.astype(str) == w.astype(str)).all(), c
        else:
            assert (g == w).all(), c
