"""write_static_tsv: reference-layout round trip (read → melt → write →
read → melt gives the identical claim set) and byte determinism."""

import glob
import os

import pyarrow as pa
import pytest

from trustfuse_ray import synth

SF = "/root/testdata/sf0.001"


def _claims_from(d):
    from trustfuse_ray.sources.static import melt_to_claims, read_static_tsv

    headers = ["Source", "Entity"] + list(synth.ATTRS)
    wide = read_static_tsv(d, headers, engine="arrow")
    return melt_to_claims(wide, entity_col="Entity",
                          attrs=list(synth.ATTRS),
                          attribute_types=synth.ATTR_TYPES)


def _key_set(claims):
    df = claims.to_pandas()
    return set(zip(df["bucket_id"], df["source"], df["entity"],
                   df["attr"], df["raw_value"]))


def test_round_trip_claim_set(ray_session, tmp_path):
    from trustfuse_ray.sources.static import write_static_tsv

    src_dir = synth.generate_claims_tsv(SF)
    claims = _claims_from(src_dir)
    out = str(tmp_path / "tsv")
    man = write_static_tsv(claims, out, list(synth.ATTRS)).to_pandas()
    assert man["rows"].sum() > 0
    assert len(glob.glob(os.path.join(out, "bucket-*.tsv"))) == len(man)
    again = _claims_from(out)
    assert _key_set(again) == _key_set(claims)


def test_byte_determinism_across_layouts(ray_session, tmp_path):
    from trustfuse_ray.sources.static import write_static_tsv

    src_dir = synth.generate_claims_tsv(SF)
    claims = _claims_from(src_dir).materialize()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_static_tsv(claims, a, list(synth.ATTRS)).materialize()
    write_static_tsv(claims.repartition(7), b,
                     list(synth.ATTRS)).materialize()
    for f in sorted(os.listdir(a)):
        assert (open(os.path.join(a, f), "rb").read()
                == open(os.path.join(b, f), "rb").read())
