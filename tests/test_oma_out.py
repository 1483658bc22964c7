"""K3/A4/K4: key-partitioned self-describing output — write the golden
conversion multiset partitioned by (chunk_type, tile_bucket, key), read it
back, and reconstruct the exact multiset plus the embedded configs."""

from collections import Counter

from oma_ray.pipelines.oma_out import read_entries, write_entries
from oma_ray.pipelines.osm import convert_osm
from oma_ray.sources.osm_xml import read_osm_xml
from oma_ray.stages.classify import TypeConfig
from oma_ray.synth import default_bbs_text
from oma_ray.synth_osm import osm_fixture_xml


def test_partitioned_write_roundtrip(ray_session, tmp_path):
    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg_text = open("/root/reference/default.type").read()
    entries = convert_osm(
        nodes, ways, rels, default_bbs_text(), TypeConfig.parse(cfg_text)
    )
    out = str(tmp_path / "oma_out")
    write_entries(
        entries, out, type_text=cfg_text, bbs_text=default_bbs_text()
    )

    back, config = read_entries(out)
    assert Counter(back) == Counter(entries)

    # K4: the output is self-describing — the embedded config re-parses to
    # the same classifier tables
    cfg2 = TypeConfig.parse(config["type_config"])
    ref = TypeConfig.parse(cfg_text)
    assert cfg2.node_keys == ref.node_keys
    assert cfg2.way_keys == ref.way_keys
    assert cfg2.prefixes == ref.prefixes
    assert config["bbs"] == default_bbs_text()

    # the block axis is a real partition directory level
    import glob

    key_dirs = glob.glob(f"{out}/data/*/*/*")
    assert any("key_part=highway" in d for d in key_dirs)
    assert any("key_part=__other__" in d for d in key_dirs)

    # manifest records the write (A2 metrics)
    from oma_ray.state.manifest import Manifest

    m = Manifest(out).metrics()
    assert m["rows"] == len(entries)
    assert m["partitions"] >= 2


def test_entry_streams_dataset_native_write(ray_session, tmp_path):
    """VERDICT r02 next-step #1: PBF → distributed reunify → partitioned
    parquet with NO take_all/to_pandas of entry streams anywhere in the
    path; read back the identical multiset; rerun resumes (skips all
    completed streams)."""
    from oma_ray.pipelines.osm_dist import convert_pbf_to_dir
    from oma_ray.sources.pbf import write_pbf
    from oma_ray.state.manifest import Manifest

    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg_text = open("/root/reference/default.type").read()
    cfg = TypeConfig.parse(cfg_text)
    ref = Counter(convert_osm(nodes, ways, rels, default_bbs_text(), cfg))

    p = str(tmp_path / "fixture.pbf")
    write_pbf(p, nodes, ways, rels, block_size=7)
    out = str(tmp_path / "dir_out")
    convert_pbf_to_dir(
        p, default_bbs_text(), cfg, out, type_text=cfg_text
    )

    back, config = read_entries(out)
    assert Counter(back) == ref
    assert config["type_config"] == cfg_text

    # per-stream lineage recorded; rerun skips every stream (resume)
    man = Manifest(out)
    done = man.done_lineages()
    assert {"stream:node", "stream:way"} <= done
    import os

    mtimes = {}
    for root, _dirs, files in os.walk(os.path.join(out, "data")):
        for f in files:
            fp = os.path.join(root, f)
            mtimes[fp] = os.path.getmtime(fp)
    convert_pbf_to_dir(p, default_bbs_text(), cfg, out, type_text=cfg_text)
    for fp, t in mtimes.items():
        assert os.path.getmtime(fp) == t  # untouched: streams were skipped
    back2, _ = read_entries(out)
    assert Counter(back2) == ref


def test_entry_streams_flag_variants(ray_session, tmp_path):
    """The dataset-native conversion must honor the CLI-visible semantics
    the collected path honors: one-element mode (-1) and meta projection
    (-p none) produce the same multiset through the partitioned-dir
    path."""
    from oma_ray.pipelines.osm_dist import convert_pbf_to_dir
    from oma_ray.sources.pbf import write_pbf

    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg = TypeConfig.default()
    p = str(tmp_path / "fixture.pbf")
    write_pbf(p, nodes, ways, rels, block_size=7)

    for name, kw in (
        ("one_element", {"one_element": True}),
        ("p_none", {"preserve": set()}),
    ):
        ref = Counter(
            convert_osm(nodes, ways, rels, default_bbs_text(), cfg, **kw)
        )
        out = str(tmp_path / f"out_{name}")
        convert_pbf_to_dir(p, default_bbs_text(), cfg, out, **kw)
        back, _cfg = read_entries(out)
        assert Counter(back) == ref, name


def test_read_entries_ds_pruned(ray_session, tmp_path):
    """Prune-at-the-read Dataset over the partitioned dir: partition-axis
    pruning matches full-scan filters, partition columns come back, and
    column pruning works on top."""
    from oma_ray.pipelines.oma_out import read_entries_ds
    from oma_ray.pipelines.osm_dist import convert_pbf_to_dir
    from oma_ray.sources.pbf import write_pbf

    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg_text = open("/root/reference/default.type").read()
    cfg = TypeConfig.parse(cfg_text)
    p = str(tmp_path / "fixture.pbf")
    write_pbf(p, nodes, ways, rels, block_size=7)
    out = str(tmp_path / "dir_out")
    convert_pbf_to_dir(p, default_bbs_text(), cfg, out, type_text=cfg_text)

    full = read_entries_ds(out).to_pandas()
    assert len(full) > 0 and "chunk_type" in full.columns
    for ct in sorted(full["chunk_type"].unique()):
        pruned = read_entries_ds(out, chunk_type=ct).to_pandas()
        assert len(pruned) == (full["chunk_type"] == ct).sum()
        assert (pruned["chunk_type"] == ct).all()
    kp = full["key_part"].iloc[0]
    pruned = read_entries_ds(out, key_part=kp).to_pandas()
    assert len(pruned) == (full["key_part"] == kp).sum() > 0
    # column pruning on top of partition pruning
    narrow = read_entries_ds(out, chunk_type="N", columns=["key", "value"])
    assert narrow.count() == (full["chunk_type"] == "N").sum()
    # empty prune result keeps the flat schema
    assert read_entries_ds(out, key_part="no_such_key").count() == 0
