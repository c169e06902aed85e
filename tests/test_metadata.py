"""Metadata engine: tuple block round trips, sample attach/read."""

from cineform_tpu import metadata as md
from cineform_tpu.models import intra_host
from cineform_tpu.utils.testframes import yuy2_frame


def test_tuple_block_roundtrip():
    m = md.Metadata()
    m.add(md.Tag.CAMERA_NAME, "cam-A")
    m.add(md.Tag.UNIQUE_FRAME, 42)
    m.add(md.Tag.EXPOSURE, 1.5)
    m.add(md.Tag.WHITE_BALANCE, [1.25, 1.0, 0.75])
    m.add(md.Tag.GUID, b"\x11" * 16)
    items = md.Metadata.parse_block(m.block())
    assert [i.tag for i in items] == ["CAMN", "UFRM", "EXPO", "WBAL", "GUID"]
    assert items[0].value == "cam-A"
    assert items[1].value == 42
    assert abs(items[2].value - 1.5) < 1e-6
    assert [round(v, 3) for v in items[3].value] == [1.25, 1.0, 0.75]
    assert items[4].payload == b"\x11" * 16


def test_sample_metadata_read_and_find():
    w, h = 160, 120
    sample = intra_host.encode_sample(yuy2_frame(w, h, 0), w, h, 4)
    items = md.read_metadata(sample)
    tags = [i.tag for i in items]
    # global block: GUID, DATE, TIME, TIMC, UFRM + the FREE chunk
    for t in ("GUID", "DATE", "TIME", "TIMC", "UFRM", "FREE"):
        assert t in tags, tags
    tc = md.find_metadata(sample, md.Tag.TIMECODE)
    assert tc is not None and tc.typ == md.TYPE_STRING
    assert md.find_metadata(sample, "XXXX") is None


def test_encoder_metadata_matches_blocks():
    """EncoderMetadata (the byte-exact writer) serializes through the same
    tuple format the Metadata class parses."""
    em = intra_host.EncoderMetadata(date="2026-08-16", time="12:00:00",
                                    timecode="12:00:00:01", unique_frame=7)
    items = md.Metadata.parse_block(em.block())
    by_tag = {i.tag: i for i in items}
    assert by_tag["DATE"].value == "2026-08-16"
    assert by_tag["TIMC"].value == "12:00:00:01"
    assert by_tag["UFRM"].value == 7
