import zlib

import pytest

from unipdf_spark.pdf import filters


def test_flate_roundtrip():
    data = b"hello world " * 100
    assert filters.flate_decode(zlib.compress(data)) == data


def test_flate_png_predictor_up():
    # columns=4, colors=1, bpc=8; encode rows with Up predictor
    rows = [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8])]
    enc = bytearray()
    prev = bytes(4)
    for r in rows:
        enc.append(2)  # Up
        enc.extend((r[i] - prev[i]) & 0xFF for i in range(4))
        prev = r
    out = filters._apply_png_predictor(bytes(enc), 1, 8, 4)
    assert out == b"".join(rows)


def test_ascii_hex():
    assert filters.ascii_hex_decode(b"48656C6C6F>") == b"Hello"
    assert filters.ascii_hex_decode(b"48 65 6C>") == b"Hel"
    # odd digit count pads with 0
    assert filters.ascii_hex_decode(b"4>") == b"\x40"


def test_ascii85():
    import base64

    payload = b"some binary \x00\x01\x02 payload"
    enc = base64.a85encode(payload) + b"~>"
    assert filters.ascii85_decode(enc) == payload


def test_run_length():
    # literal run: length byte 2 → copy 3 bytes; then 257-254=3 repeats of 'x'
    enc = bytes([2]) + b"abc" + bytes([254]) + b"x" + bytes([128])
    assert filters.run_length_decode(enc) == b"abcxxx"


def test_lzw_known_vector():
    # PDF spec example: 45 45 45 65 65 65 encoded
    # build via a tiny reference encoder inline
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        dec_size = 258  # decoder-table mirror drives the code width
        code_len = 9
        n_emitted = 0
        out_bits = [(256, 9)]  # clear

        def emit(code):
            nonlocal dec_size, code_len, n_emitted
            out_bits.append((code, code_len))
            n_emitted += 1
            if n_emitted > 1 and dec_size < 4096:
                dec_size += 1
                if dec_size + 1 >= (1 << code_len) and code_len < 12:
                    code_len += 1

        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                emit(table[w])
                table[wc] = next_code
                next_code += 1
                w = bytes([ch])
        if w:
            emit(table[w])
        out_bits.append((257, code_len))
        buf = 0
        nbits = 0
        out = bytearray()
        for code, cl in out_bits:
            buf = (buf << cl) | code
            nbits += cl
            while nbits >= 8:
                nbits -= 8
                out.append((buf >> nbits) & 0xFF)
        if nbits:
            out.append((buf << (8 - nbits)) & 0xFF)
        return bytes(out)

    data = b"the quick brown fox jumps over the lazy dog " * 20
    assert filters.lzw_decode(lzw_encode(data)) == data


def test_multi_filter_compose():
    data = b"payload" * 50
    import base64

    enc = base64.a85encode(zlib.compress(data)) + b"~>"
    out = filters.decode_stream(enc, ["ASCII85Decode", "FlateDecode"], [{}, {}])
    assert out == data


def test_unknown_filter_raises():
    with pytest.raises(filters.FilterError):
        filters.decode_stream(b"x", ["NoSuchFilter"], [{}])
