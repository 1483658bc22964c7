"""Command-line converter mirroring the reference's interface (Oma.java:155-239):

    python -m oma_ray.cli [options] input.{osm,o5m,pbf} [output.oma]

Options (same letters, same semantics):
  -b <file>   custom .bbs tiling grid
  -t <file>   custom .type classification table
  -p <list>   meta fields to preserve: all | none | comma list of
              id, version|v, timestamp|time|ts, changeset|cs, user|uid
  -0          no compression
  -1          add each element only once
  -d          (engine extension) use the DISTRIBUTED conversion path
  -v / -s     verbose / silent (accepted; the engine's progress is Ray's)
  -c / -m / -tmp  accepted and ignored — they tune the reference's
              single-process memory/chunk management, which the Ray object
              store replaces (SURVEY §4)

Output: a .oma container (sources/oma_write.py) whose entry multiset
matches what the reference jar produces for the same input — the golden
differential tests are the proof.
"""

from __future__ import annotations

import sys

PRESERVE_TOKENS = {
    "id": "id",
    "version": "version", "v": "version",
    "timestamp": "timestamp", "time": "timestamp", "ts": "timestamp",
    "changeset": "changeset", "cs": "changeset",
    "user": "user", "uid": "user",
}
ALL = {"id", "version", "timestamp", "changeset", "user"}


def parse_preserve(s: str) -> set:
    toks = [t for t in s.split(",") if t]
    if toks == ["all"]:
        return set(ALL)
    if toks == ["none"]:
        return set()
    out = set()
    for t in toks:
        if t in ("all", "none"):
            raise SystemExit(f"'-p {t}' cannot be mixed with other values")
        if t not in PRESERVE_TOKENS:
            raise SystemExit(f"unknown element '{t}' to preserve")
        out.add(PRESERVE_TOKENS[t])
    return out


def features_of(preserve: set, one_element: bool) -> int:
    f = 0
    if "id" in preserve:
        f |= 1
    if "version" in preserve:
        f |= 2
    if "timestamp" in preserve:
        f |= 4
    if "changeset" in preserve:
        f |= 8
    if "user" in preserve:
        f |= 16
    if one_element:
        f |= 32
    return f


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    bbs_file = type_file = None
    preserve: set = set()
    zip_slices = True
    one_element = False
    distributed = False
    paths: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-b", "-t", "-p", "-tmp", "-m", "-c"):
            if i == len(argv) - 1:
                raise SystemExit(f"missing argument after '{a}'")
            val = argv[i + 1]
            i += 2
            if a == "-b":
                bbs_file = val
            elif a == "-t":
                type_file = val
            elif a == "-p":
                preserve = parse_preserve(val)
            # -tmp / -m / -c accepted, no engine equivalent
            continue
        if a == "-0":
            zip_slices = False
        elif a == "-1":
            one_element = True
        elif a == "-d":
            distributed = True
        elif a in ("-v", "-s"):
            pass
        elif a == "--help":
            print(__doc__)
            return 0
        elif a.startswith("-"):
            raise SystemExit(f"unknown option '{a}'")
        else:
            paths.append(a)
        i += 1
    if not paths:
        raise SystemExit("no input file given")
    if len(paths) > 2:
        raise SystemExit("additional arguments after filename(s)")
    infile = paths[0]
    outfile = (
        paths[1] if len(paths) > 1
        else (infile.rsplit(".", 1)[0] if "." in infile else infile) + ".oma"
    )

    from oma_ray.sources.oma_write import write_oma
    from oma_ray.sources.sniff import read_osm_any
    from oma_ray.stages.classify import TypeConfig
    from oma_ray.synth import default_bbs_text

    bbs_text = (
        open(bbs_file).read() if bbs_file else default_bbs_text()
    )
    type_text = open(
        type_file if type_file else "/root/reference/default.type"
    ).read()
    cfg = TypeConfig.parse(type_text)

    if distributed and infile.endswith(".pbf"):
        # fully streaming scale path: blob-parallel decode → distributed
        # reunify → partitioned parquet → per-bucket container assembly;
        # neither the element set nor the entry set ever sits in driver
        # memory (the partitioned dir doubles as the resume checkpoint)
        import tempfile

        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        from oma_ray.pipelines.osm_dist import convert_pbf_to_dir
        from oma_ray.sources.oma_write import write_oma_from_dir

        with tempfile.TemporaryDirectory(prefix="oma_conv_") as td:
            convert_pbf_to_dir(
                infile, bbs_text, cfg, f"{td}/conv", type_text=type_text,
                preserve=preserve, one_element=one_element,
            )
            write_oma_from_dir(
                f"{td}/conv", outfile,
                features=features_of(preserve, one_element),
                zip_slices=zip_slices,
            )
        print(f"{outfile}: written (streaming)")
        return 0

    nodes, ways, rels = read_osm_any(infile)
    if distributed:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        from oma_ray.pipelines.osm_dist import convert_osm_distributed

        entries = convert_osm_distributed(
            nodes, ways, rels, bbs_text, cfg,
            preserve=preserve, one_element=one_element,
        )
    else:
        from oma_ray.pipelines.osm import convert_osm

        entries = convert_osm(
            nodes, ways, rels, bbs_text, cfg,
            preserve=preserve, one_element=one_element,
        )
    write_oma(
        outfile, entries, cfg,
        features=features_of(preserve, one_element),
        zip_slices=zip_slices,
    )
    print(f"{outfile}: {len(entries)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
