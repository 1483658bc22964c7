"""Semantic classifier: the reference's ``.type`` config and its
first-match key/value/lifecycle classification (TypeAnalysis.java M7-M9).

``TypeConfig.parse`` implements the indentation-structured config exactly
(TypeAnalysis.java:67-229): top-level section names (NODE / WAY / COLLECTION
/ LIFECYCLE), 2-space keys, 4-space entries (values for NODE/COLLECTION;
IS_AREA / WAY / AREA / EXCEPTIONS switches for WAY), 6-space values within a
WAY submode.  Key order is load-bearing (first match wins per key; an
element joins EVERY matching key's block unless ``one_element``).

``classify_*`` reproduce the classification loop (TypeAnalysis.java:437-516)
including its mutation semantics: lifecycle rewrites mutate the element's
tags mid-loop, block membership holds references (so emitted copies carry
the END-of-loop tags), while a way spilled to the split stream snapshots
tags at the moment of its first way-path match.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TypeConfig:
    node_keys: list = field(default_factory=list)
    node_values: list = field(default_factory=list)
    way_keys: list = field(default_factory=list)
    way_values: list = field(default_factory=list)
    area_values: list = field(default_factory=list)
    is_area: list = field(default_factory=list)
    exceptions: list = field(default_factory=list)
    coll_keys: list = field(default_factory=list)
    coll_values: list = field(default_factory=list)
    prefixes: list = field(default_factory=lambda: [""])

    @classmethod
    def parse(cls, text: str) -> "TypeConfig":
        cfg = cls()
        mode = None
        submode = None
        values = avalues = evalues = None
        for line in text.splitlines():
            if not line.strip() or line.lstrip().startswith("#"):
                if line.strip().startswith("#"):
                    continue
                if not line.strip():
                    continue
            if line.startswith("      "):
                t = line.strip()
                if submode == "WAY":
                    values.append(t)
                elif submode == "AREA":
                    avalues.append(t)
                elif submode == "EXCEPTIONS":
                    evalues.append(t)
            elif line.startswith("    "):
                t = line.strip()
                if mode in ("NODE", "COLLECTION"):
                    values.append(t)
                elif mode == "WAY":
                    if t == "IS_AREA":
                        cfg.is_area[-1] = True
                    elif t in ("WAY", "AREA", "EXCEPTIONS"):
                        submode = t
            elif line.startswith("  "):
                key = line.strip()
                if mode == "NODE":
                    cfg.node_keys.append(key)
                    values = []
                    cfg.node_values.append(values)
                elif mode == "WAY":
                    cfg.way_keys.append(key)
                    cfg.is_area.append(False)
                    values = []
                    cfg.way_values.append(values)
                    avalues = []
                    cfg.area_values.append(avalues)
                    evalues = []
                    cfg.exceptions.append(evalues)
                elif mode == "COLLECTION":
                    cfg.coll_keys.append(key)
                    values = []
                    cfg.coll_values.append(values)
                elif mode == "LIFECYCLE":
                    cfg.prefixes.append(key + ":")
            else:
                mode = line.strip()
                submode = None
        return cfg

    @classmethod
    def default(cls) -> "TypeConfig":
        with open("/root/reference/default.type") as f:
            return cls.parse(f.read())

    def keys_for(self, chunk_type: str) -> list:
        return (
            self.node_keys if chunk_type == "N"
            else self.coll_keys if chunk_type == "C"
            else self.way_keys
        )

    def values_for(self, chunk_type: str, j: int) -> list:
        if chunk_type == "N":
            return self.node_values[j]
        if chunk_type == "C":
            return self.coll_values[j]
        if chunk_type == "A":
            return self.area_values[j]
        return self.way_values[j]


def way_is_area(cfg: TypeConfig, tags: dict, closed: bool, j: int) -> bool:
    """isArea truth table (TypeAnalysis.java:518-526)."""
    if not closed:
        return False
    area = tags.get("area")
    if area == "yes":
        return True
    if area == "no":
        return False
    if j == -1:
        return False
    return cfg.is_area[j] != (tags.get(cfg.way_keys[j]) in cfg.exceptions[j])


def _slice_value(cfg: TypeConfig, chunk_type: str, j: int, tags: dict) -> str:
    v = tags.get(cfg.keys_for(chunk_type)[j])
    return v if v in cfg.values_for(chunk_type, j) else ""


def classify_plain(cfg: TypeConfig, chunk_type: str, tags: dict,
                   one_element: bool = False):
    """N / C / A chunks (and re-analysed W): → (final_tags,
    [(key, value)] block/slice assignments; [("","")] = other block).

    Mutates a copy of ``tags`` through lifecycle rewrites exactly as the
    classification loop does (TypeAnalysis.java:450-480)."""
    tags = dict(tags)
    keys = cfg.keys_for(chunk_type)
    out = []
    used = False
    done = False
    for j, key in enumerate(keys):
        if done:
            break
        for k, prefix in enumerate(cfg.prefixes):
            pk = prefix + key
            if pk in tags:
                used = True
                if k > 0:
                    tags["lifecycle"] = prefix[:-1]
                    tags[key] = tags[pk]
                    del tags[pk]
                out.append(j)
                if one_element:
                    done = True
                break
    if not used:
        return tags, [("", "")]
    return tags, [
        (keys[j], _slice_value(cfg, chunk_type, j, tags)) for j in out
    ]


def classify_way_split(cfg: TypeConfig, tags: dict, closed: bool,
                       one_element: bool = False):
    """W chunks in split mode (TypeAnalysis.java:450-495): →
    (final_tags, area_assignments [(key, value)], split_tags_or_None).

    area_assignments are emitted as 'A'-typed entries; split_tags (tags
    snapshot at first way-path match) is re-analysed via classify_plain as a
    'W' element; the unmatched case routes closed area=yes ways to the 'A'
    other block and everything else to the split stream."""
    tags = dict(tags)
    keys = cfg.way_keys
    area_out = []
    split_tags = None
    used = False
    other_area = False
    done = False
    for j, key in enumerate(keys):
        if done:
            break
        for k, prefix in enumerate(cfg.prefixes):
            pk = prefix + key
            if pk in tags:
                used = True
                if not way_is_area(cfg, tags, closed, j):
                    if split_tags is None:
                        split_tags = dict(tags)
                    if one_element:
                        done = True
                    break
                if k > 0:
                    tags["lifecycle"] = prefix[:-1]
                    tags[key] = tags[pk]
                    del tags[pk]
                area_out.append(j)
                if one_element:
                    done = True
                break
    if not used:
        if not way_is_area(cfg, tags, closed, -1):
            if split_tags is None:
                split_tags = dict(tags)
        else:
            other_area = True
    assignments = [
        ("A", keys[j], _slice_value(cfg, "A", j, tags)) for j in area_out
    ]
    if other_area:
        assignments.append(("A", "", ""))
    return tags, assignments, split_tags
