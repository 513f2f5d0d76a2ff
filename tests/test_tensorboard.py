"""TensorBoard event-writer tests: TFRecord framing, masked crc32c,
and scalar-proto roundtrip via an independent decoder."""

import struct

import numpy as np

from unmore_tpu.utils.tensorboard import EventWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        header = data[pos : pos + 8]
        (len_crc,) = struct.unpack_from("<I", data, pos + 8)
        assert len_crc == _masked_crc(header)
        payload = data[pos + 12 : pos + 12 + length]
        (payload_crc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert payload_crc == _masked_crc(payload)
        records.append(payload)
        pos += 12 + length + 4
    return records


def _decode_varint(buf, pos):
    out = shift = 0
    while True:
        b = buf[pos]
        out |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return out, pos
        shift += 7


def _decode_event(buf):
    """Minimal Event decoder (wall_time, step, [(tag, value)])."""
    pos, step, wall, values = 0, None, None, []
    while pos < len(buf):
        key, pos = _decode_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 1:
            (val,) = struct.unpack_from("<d", buf, pos)
            pos += 8
            if field == 1:
                wall = val
        elif wire == 0:
            val, pos = _decode_varint(buf, pos)
            if field == 2:
                step = val
        elif wire == 2:
            ln, pos = _decode_varint(buf, pos)
            sub = buf[pos : pos + ln]
            pos += ln
            if field == 5:  # summary
                spos = 0
                while spos < len(sub):
                    skey, spos = _decode_varint(sub, spos)
                    sln, spos = _decode_varint(sub, spos)
                    v = sub[spos : spos + sln]
                    spos += sln
                    vpos, tag, sv = 0, None, None
                    while vpos < len(v):
                        vkey, vpos = _decode_varint(v, vpos)
                        if vkey & 7 == 2:
                            vln, vpos = _decode_varint(v, vpos)
                            tag = v[vpos : vpos + vln].decode()
                            vpos += vln
                        elif vkey & 7 == 5:
                            (sv,) = struct.unpack_from("<f", v, vpos)
                            vpos += 4
                    values.append((tag, sv))
    return wall, step, values


def test_event_writer_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("loss/total", 1.25, step=20)
    w.add_scalars({"lr": 0.01, "ips": 42.5}, step=40)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(str(files[0]))
    assert len(records) == 4  # file_version + 3 scalars
    wall, step, vals = _decode_event(records[1])
    assert step == 20 and wall is not None
    assert vals == [("loss/total", 1.25)]
    _, step40, vals40 = _decode_event(records[2])
    assert step40 == 40 and vals40[0][0] == "lr"
    assert np.isclose(vals40[0][1], 0.01)
