"""Foreign-layout PDF emitter: a SECOND serializer for the fixture
writer's object graph, deliberately using different file conventions
than render.py's canonical `build`/`build_modern` paths.

Every fixture PDF in rounds 1-7 was laid out by one writer, so file-level
conventions that writer never varies were untested even though the
reference's parser handles them (core/core.go:129 lexer generality,
:1181 indirect-/Length stream tracing, model/model.go:2640 multi-segment
Contents concatenation). This module re-serializes the SAME objects —
golden spans are untouched — through a seeded grab-bag of real-world
producer quirks:

- comments and exotic whitespace (CR, CRLF, FF, TAB, NUL runs) between
  lexical tokens inside dictionaries;
- `#XX` hex escapes inside name tokens (/T#79pe for /Type);
- indirect /Length objects emitted AFTER their stream (forward
  reference: the reader must two-phase the stream extent);
- page /Contents split into an ARRAY of stream segments, cut between
  lexical tokens but freely across operand/operator boundaries (readers
  concatenate all segments before lexing — reference GetAllContentStreams
  joins with a space, the engine with a newline);
- per-segment /Filter chains re-drawn from the full decode set,
  including redundant multi-member chains (double Flate);
- classic xref tables with MULTIPLE subsections, shuffled object order
  in the file, and planted free entries — or modern containers with
  varied xref-stream /W widths, multi-pair /Index, and object-stream
  packing permutations (several /ObjStm objects, shuffled membership,
  some non-stream objects left direct);
- optional AES-256 (R6) encryption over the modern container: stream
  payloads and direct-object strings encrypted, objects packed in object
  streams NOT individually encrypted (the containing ObjStm already is),
  xref stream and /Encrypt dict exempt — the interop trap of
  ISO 32000-2 §7.6.3;
- wrong stored /Length values (too small by 5-16 / too large by 3-16
  bytes, deltas chosen so recovery is unambiguous — see emit_stream) that
  force the reader's endstream re-location repair;
- all three legal 20-byte xref-row terminators (SP CR, SP LF, CR LF)
  and both `stream`-keyword EOLs (LF, CRLF);
- transport wrappers: junk bytes BEFORE %PDF- (offsets stay relative to
  the header; the reader must rebase) and junk AFTER %%EOF (the reader's
  backward startxref scan must skip it).

The chosen knobs are stamped into a `%%foreign-profile:` comment line
after the header so tests can assert corpus-level coverage of every
convention from the bytes alone (comments are lexically invisible to
any conforming reader).

Fixture-independence: imports only render.py's writer-side helpers
(encoders + encryption parameter math); nothing from unipdf_spark.pdf.
"""

from __future__ import annotations

import binascii
import hashlib
import json
import random
import re
import zlib

from .render import (_ENCODERS, PdfFileWriter, _aes256_stream,
                     aes256_encrypt_params, encode_chain)

_WS_BYTES = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"

# separators drawn between tokens (always ≥1 whitespace byte so the
# re-emitted object parses regardless of token adjacency rules)
_WS_CHOICES = [b" ", b"  ", b"\n", b"\r\n", b"\r", b"\t", b"\x0c",
               b" \r\n ", b"\x00 "]

_FILTER_CHAINS = [
    ["FlateDecode"],
    ["FlateDecode", "FlateDecode"],           # redundant double Flate
    ["ASCIIHexDecode", "FlateDecode"],
    ["ASCII85Decode", "FlateDecode"],
    ["RunLengthDecode"],
    ["ASCIIHexDecode", "LZWDecode"],
    ["LZWDecode"],
    ["ASCII85Decode", "RunLengthDecode", "FlateDecode"],
]

_XREF_W_CHOICES = [[1, 3, 2], [1, 4, 2], [2, 4, 2], [1, 4, 1], [1, 5, 2]]

_STAMP_PAD = 768  # reserved bytes for the %%foreign-profile comment


# --- COS tokenizer -----------------------------------------------------------


def tokenize(body: bytes) -> list[bytes]:
    """Split a (non-stream-payload) COS object body into lexical tokens.
    Token classes: '<<' '>>' '[' ']' names literal-strings hex-strings
    numbers keywords. The input is our own writer's regular output, so
    '{', '}' and comments never occur."""
    toks: list[bytes] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c in _WS_BYTES:
            i += 1
            continue
        if body.startswith(b"<<", i):
            toks.append(b"<<")
            i += 2
        elif body.startswith(b">>", i):
            toks.append(b">>")
            i += 2
        elif c == 0x5B:
            toks.append(b"[")
            i += 1
        elif c == 0x5D:
            toks.append(b"]")
            i += 1
        elif c == 0x2F:  # name
            j = i + 1
            while j < n and body[j] not in _WS_BYTES and body[j] not in _DELIMS:
                j += 1
            toks.append(body[i:j])
            i = j
        elif c == 0x28:  # literal string, balanced parens + backslash esc
            depth = 0
            j = i
            while j < n:
                b = body[j]
                if b == 0x5C:
                    j += 2
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                j += 1
            toks.append(body[i:j])
            i = j
        elif c == 0x3C:  # hex string
            j = body.index(b">", i) + 1
            toks.append(body[i:j])
            i = j
        else:  # number or keyword
            j = i
            while j < n and body[j] not in _WS_BYTES and body[j] not in _DELIMS:
                j += 1
            toks.append(body[i:j])
            i = j
    return toks


_NUM_TOK = re.compile(rb"^[+-]?\d+$")


def _value_span(toks: list[bytes], i: int) -> int:
    """Length (token count) of the value starting at toks[i]: a balanced
    << >> / [ ] group, an `N G R` indirect reference, or one token."""
    t = toks[i]
    if t in (b"<<", b"["):
        close = b">>" if t == b"<<" else b"]"
        openr = t
        depth = 0
        j = i
        while j < len(toks):
            if toks[j] == openr:
                depth += 1
            elif toks[j] == close:
                depth -= 1
                if depth == 0:
                    return j - i + 1
            j += 1
        raise ValueError("unbalanced group")
    if (_NUM_TOK.match(t) and i + 2 < len(toks)
            and _NUM_TOK.match(toks[i + 1]) and toks[i + 2] == b"R"):
        return 3
    return 1


def dict_entry(toks: list[bytes], key: bytes) -> tuple[int, int] | None:
    """(value_start, value_len) of /key at the TOP level of the outermost
    << >> group, else None."""
    depth = 0
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == b"<<":
            depth += 1
            i += 1
            continue
        if t == b">>":
            depth -= 1
            i += 1
            continue
        if depth == 1 and t == key:
            span = _value_span(toks, i + 1)
            return i + 1, span
        if depth >= 1 and t.startswith(b"/"):
            # skip this key's value wholesale so nested dict keys at
            # depth>1 can't shadow the top-level lookup
            span = _value_span(toks, i + 1)
            i += 1 + span
            continue
        i += 1
    return None


def replace_entry(toks: list[bytes], key: bytes,
                  new_value: list[bytes]) -> list[bytes]:
    ent = dict_entry(toks, key)
    if ent is None:
        # insert before the closing '>>' of the outer dict
        return toks[:-1] + [key] + new_value + toks[-1:]
    s, ln = ent
    return toks[:s] + new_value + toks[s + ln:]


def _unescape_literal(tok: bytes) -> bytes:
    """Value bytes of a literal-string token produced by esc_string
    (escapes limited to \\\\ \\( \\))."""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        if body[i] == 0x5C and i + 1 < len(body):
            out.append(body[i + 1])
            i += 2
        else:
            out.append(body[i])
            i += 1
    return bytes(out)


# --- object model ------------------------------------------------------------


class _Obj:
    __slots__ = ("toks", "payload", "src", "keep_direct")

    def __init__(self, toks, payload=None, src=None):
        self.toks = toks            # dict/body tokens
        self.payload = payload      # encoded stream payload or None
        self.src = src              # (data, filters) pre-encode source
        self.keep_direct = False    # must stay outside any ObjStm


def _split_stream_body(body: bytes) -> tuple[bytes, bytes]:
    """(dict_bytes, payload) for a stored `<<...>>\\nstream\\n...` body,
    slicing the payload by the dict's own direct /Length."""
    idx = body.index(b">>\nstream\n")
    dict_bytes = body[: idx + 2]
    m = re.search(rb"/Length (\d+)", dict_bytes)
    start = idx + len(b">>\nstream\n")
    return dict_bytes, body[start : start + int(m.group(1))]


def _load_objects(w: PdfFileWriter) -> dict[int, _Obj]:
    objs: dict[int, _Obj] = {}
    src_map = getattr(w, "stream_src", {})
    for num in range(1, len(w._objs)):
        body = w._objs[num]
        if body is None:
            raise ValueError(f"object {num} reserved but never set")
        if b">>\nstream\n" in body:
            dict_bytes, payload = _split_stream_body(body)
            objs[num] = _Obj(tokenize(dict_bytes), payload,
                             src_map.get(num))
        else:
            objs[num] = _Obj(tokenize(body))
    return objs


# --- content splitting -------------------------------------------------------


def safe_split_points(content: bytes) -> list[int]:
    """Offsets where the content stream may be cut between lexical tokens:
    right after a whitespace byte that is outside literal strings and
    outside BI..ID..EI inline-image sections. Cutting between an
    operator's operands and its name IS allowed (readers concatenate
    segments before tokenizing)."""
    pts: list[int] = []
    i, n = 0, len(content)
    paren = 0
    while i < n:
        c = content[i]
        if paren:
            if c == 0x5C:
                i += 2
                continue
            if c == 0x28:
                paren += 1
            elif c == 0x29:
                paren -= 1
            i += 1
            continue
        if c == 0x28:
            paren += 1
            i += 1
            continue
        if content.startswith(b"BI ", i) or content.startswith(b"BI\n", i):
            e = content.index(b" EI", i)  # fixture data never contains EI
            i = e + 3
            continue
        if c in b" \n" and 0 < i < n - 1:
            pts.append(i + 1)
        i += 1
    return pts


def _split_content(data: bytes, rng: random.Random,
                   k: int) -> tuple[list[bytes], bool]:
    """Split into ≤k non-empty segments at safe points; returns (segments,
    any split landed between an operand and its operator)."""
    pts = safe_split_points(data)
    if not pts or k <= 1:
        return [data], False
    cuts = sorted(rng.sample(pts, min(k - 1, len(pts))))
    segs = []
    prev = 0
    for c in cuts:
        if c > prev:
            segs.append(data[prev:c])
            prev = c
    segs.append(data[prev:])
    mid_op = False
    for s in segs[:-1]:
        tail = s.rstrip(b"\x00\t\n\x0c\r ")
        if tail and tail[-1:].isdigit():
            mid_op = True
    return [s for s in segs if s], mid_op


def _fragment_sections(nums: list[int], rng: random.Random,
                       fragment: float) -> list[list[int]]:
    """Contiguous runs over sorted object numbers, randomly fragmented
    further with probability `fragment` per number (0 = only the
    mandatory breaks at numbering gaps)."""
    sections: list[list[int]] = [[nums[0]]]
    for num in nums[1:]:
        if num != sections[-1][-1] + 1 or (
                fragment and rng.random() < fragment):
            sections.append([])
        sections[-1].append(num)
    return sections


def _emit_xref_table(out: bytearray, rng: random.Random, profile: dict,
                     rows: dict[int, bytes],
                     fragment: float = 0.25) -> dict[int, int]:
    """Append a classic `xref` section to `out`; `rows` maps object num
    -> its full 20-byte row (terminator included). Injects legal empty
    `N 0` subsections ~12% of the time (real producers emit them;
    readers must just move on). Returns {num: absolute offset of its
    row} so callers emitting placeholder rows can patch them later
    (the linearized head table). The ONE shared implementation behind
    every classic-table writer in this module."""
    sections = _fragment_sections(sorted(rows), rng, fragment)
    profile["xref_subsections"] = len(sections)
    out += b"xref\n"
    pos: dict[int, int] = {}
    for sec in sections:
        if rng.random() < 0.12:
            out += b"%d 0\n" % sec[0]
            profile["empty_subsection"] = True
        out += b"%d %d\n" % (sec[0], len(sec))
        for num in sec:
            pos[num] = len(out)
            out += rows[num]
    return pos


def _objstm_payload(members: list[tuple[int, bytes]]) -> tuple[bytes, int]:
    """(raw ObjStm payload, /First offset) for (num, body) members —
    the `num offset` header pairs followed by the newline-joined
    bodies (§7.5.7). The ONE shared layout behind every ObjStm this
    module emits (containers, packed /Length targets, update packs)."""
    header = bytearray()
    bodies = bytearray()
    for num, body in members:
        header += b"%d %d " % (num, len(bodies))
        bodies += body + b"\n"
    return bytes(header) + bytes(bodies), len(header)


# --- serialization -----------------------------------------------------------


class _ForeignSerializer:
    def __init__(self, rng: random.Random, encrypt_seed: bytes | None):
        self.rng = rng
        self.encrypt_seed = encrypt_seed
        self.aes_key = None
        self.profile: dict = {}
        self._str_ctr = 0

    # -- token-level cosmetics ------------------------------------------

    def _sep(self) -> bytes:
        r = self.rng
        if r.random() < 0.08:
            self.profile["comments"] = True
            junk = "".join(r.choice("abcdefg (<[/%") for _ in range(r.randint(0, 8)))
            return b" % " + junk.encode() + r.choice([b"\n", b"\r\n", b"\r"])
        if r.random() < 0.25:
            return r.choice(_WS_CHOICES)
        return b" "

    def _maybe_escape_name(self, tok: bytes) -> bytes:
        r = self.rng
        if len(tok) < 3 or r.random() > 0.15:
            return tok
        # hex-escape one regular character (never the leading '/')
        idx = r.randrange(1, len(tok))
        c = tok[idx]
        if c == 0x23 or bytes([c]) in b"0123456789abcdefABCDEF" and tok[idx - 1] == 0x23:
            return tok
        self.profile["name_escapes"] = self.profile.get("name_escapes", 0) + 1
        return tok[:idx] + b"#%02X" % c + tok[idx + 1:]

    def _encrypt_string_tok(self, tok: bytes, num: int) -> bytes:
        """Literal/hex string → encrypted hex string (direct objects only)."""
        if self.aes_key is None:
            return tok
        if tok.startswith(b"("):
            plain = _unescape_literal(tok)
        else:
            plain = binascii.unhexlify(
                re.sub(rb"[^0-9a-fA-F]", b"", tok[1:-1]))
        self._str_ctr += 1
        ct = _aes256_stream(self.aes_key, self.encrypt_seed,
                            num * 1000 + self._str_ctr, plain)
        self.profile["encrypted_strings"] = (
            self.profile.get("encrypted_strings", 0) + 1)
        return b"<" + binascii.hexlify(ct) + b">"

    def emit_tokens(self, toks: list[bytes], num: int = 0,
                    encrypt_strings: bool = False) -> bytes:
        out = bytearray()
        for i, t in enumerate(toks):
            if t.startswith(b"/"):
                t = self._maybe_escape_name(t)
            elif encrypt_strings and (t.startswith(b"(") or (
                    t.startswith(b"<") and t != b"<<")):
                t = self._encrypt_string_tok(t, num)
            if i:
                out += self._sep()
            out += t
        return bytes(out)

    # -- stream emission --------------------------------------------------

    def emit_stream(self, num: int, toks: list[bytes], payload: bytes,
                    pending: dict[int, int], next_num: list[int],
                    indirect_len: bool, encrypt: bool,
                    encrypt_strings: bool = True) -> bytes:
        """Object body bytes for a stream; when indirect_len, allocates a
        forward /Length object recorded in `pending` (num -> value)."""
        if encrypt and self.aes_key is not None:
            payload = _aes256_stream(self.aes_key, self.encrypt_seed, num,
                                     payload)
            self.profile["encrypted_streams"] = (
                self.profile.get("encrypted_streams", 0) + 1)
        if indirect_len:
            ln_num = next_num[0]
            next_num[0] += 1
            pending[ln_num] = len(payload)
            len_toks = [str(ln_num).encode(), b"0", b"R"]
            self.profile["indirect_lengths"] = (
                self.profile.get("indirect_lengths", 0) + 1)
        else:
            stored = len(payload)
            end_eol = b"\n"
            # wrong stored /Length (real-world producer bug the reference
            # repairs by re-locating endstream, core/core.go:1181). Deltas
            # chosen so recovery is UNAMBIGUOUS: too-small ≥5 keeps the real
            # endstream outside any legal EOL-adjacency window; too-large ≥3
            # lands the declared end inside the keyword, never inside the
            # separating EOL (a ±1-2 overrun into the EOL is genuinely
            # ambiguous for any reader). endstream-in-payload is excluded so
            # the rescan finds the true terminator; the pre-endstream EOL is
            # forced to CRLF so a single-EOL strip recovers the exact bytes.
            if (self.rng.random() < 0.25 and len(payload) > 32
                    and b"endstream" not in payload):
                if self.rng.random() < 0.5:
                    stored = len(payload) - self.rng.randint(5, 16)
                else:
                    stored = len(payload) + self.rng.randint(3, 16)
                end_eol = b"\r\n"
                self.profile["wrong_lengths"] = (
                    self.profile.get("wrong_lengths", 0) + 1)
            len_toks = [str(stored).encode()]
        toks = replace_entry(toks, b"/Length", len_toks)
        head = self.emit_tokens(toks, num,
                                encrypt_strings=encrypt_strings
                                and self.aes_key is not None)
        eol = self.rng.choice([b"\n", b"\r\n"])
        if eol == b"\r\n":
            self.profile["stream_crlf"] = (
                self.profile.get("stream_crlf", 0) + 1)
        if indirect_len:
            end_eol = b"\n"
        return head + self.rng.choice([b"", b" ", b"\r\n", b"\n"]) \
            + b"stream" + eol + payload + end_eol + b"endstream"


def build_foreign(w: PdfFileWriter, root_num: int, seed: str,
                  encrypt_aes256: bytes | None = None,
                  force_container: str | None = None,
                  transport_junk: bool = True) -> bytes:
    """Serialize the writer's object graph with foreign conventions.
    Deterministic in (seed, encrypt_aes256). Encryption defaults to the
    modern container (AES-256 + object streams, judge r7 #8) but hybrid
    may be forced (r10: the §7.5.8.4 table+/XRefStm shape with an
    encrypted body is exactly the intersection the r9 regression lived
    in — Acrobat emits such files). force_container
    pins the layout ('table'/'modern'/'linearized'); transport_junk=False
    suppresses the leading/trailing wrappers (required when the output
    will serve as the BASE of an incremental update: appended sections
    compute offsets from byte 0, which only agrees with the engine's
    header-relative rebase when nothing precedes the header)."""
    rng = random.Random(f"foreign:{seed}")
    ser = _ForeignSerializer(rng, encrypt_aes256)
    objs = _load_objects(w)
    profile = ser.profile
    profile["encrypted"] = encrypt_aes256 is not None

    next_num = [len(w._objs)]

    # --- object-space transformations ---------------------------------
    # 1. re-draw filter chains for re-encodable streams (never image
    #    XObjects: their media refs hash the stored payload bytes)
    for num, o in objs.items():
        if o.src is None or rng.random() < 0.3:
            continue
        data, _old = o.src[1], o.src[2]
        chain = rng.choice(_FILTER_CHAINS)
        o.payload = encode_chain(data, chain)
        if len(chain) == 1:
            ftoks = [b"/" + chain[0].encode()]
        else:
            ftoks = [b"["] + [b"/" + f.encode() for f in chain] + [b"]"]
        o.toks = replace_entry(o.toks, b"/Filter", ftoks)
        profile.setdefault("chains", []).append("+".join(chain))

    # 2. split every page's content stream into a /Contents array
    n_seg_target = rng.randint(2, 4)
    for num in list(objs):
        o = objs.get(num)
        if o is None:  # a content stream deleted by an earlier page
            continue
        ent = dict_entry(o.toks, b"/Type")
        if ent is None or o.toks[ent[0]] != b"/Page":
            continue
        cent = dict_entry(o.toks, b"/Contents")
        if cent is None or cent[1] != 3:
            continue
        cnum = int(o.toks[cent[0]])
        csrc = objs[cnum].src
        if csrc is None:
            continue
        segs, mid_op = _split_content(csrc[1], rng, n_seg_target)
        profile["content_segments"] = len(segs)
        profile["split_mid_operator"] = profile.get(
            "split_mid_operator", False) or mid_op
        seg_nums = []
        for sdata in segs:
            chain = rng.choice(_FILTER_CHAINS)
            sn = next_num[0]
            next_num[0] += 1
            if len(chain) == 1:
                ftoks = [b"/" + chain[0].encode()]
            else:
                ftoks = [b"["] + [b"/" + f.encode() for f in chain] + [b"]"]
            so = _Obj([b"<<", b"/Filter"] + ftoks
                      + [b"/Length", b"0", b">>"],
                      encode_chain(sdata, chain), (b"", sdata, chain))
            objs[sn] = so
            seg_nums.append(sn)
        arr = [b"["]
        for sn in seg_nums:
            arr += [str(sn).encode(), b"0", b"R"]
        arr.append(b"]")
        objs[num].toks = replace_entry(o.toks, b"/Contents", arr)
        del objs[cnum]  # original single stream no longer referenced
        # renumber gap: keep the number allocated but emit a free entry
        profile["freed_original_content"] = True

    stream_nums = [n for n, o in objs.items() if o.payload is not None]

    # 3. choose indirect /Length victims (≥1 stream when any exist)
    indirect: set[int] = set()
    if stream_nums:
        k = max(1, rng.randint(1, max(1, len(stream_nums) // 3)))
        indirect = set(rng.sample(stream_nums, min(k, len(stream_nums))))

    # 4. bump a subset of STREAM objects to generation 1 (real-world
    # revised-file shape). Streams are never packed into object streams,
    # which must hold generation-0 objects only (§7.5.7), so bumping
    # only streams is container-safe. Every reference triple `N 0 R`
    # to a bumped object is rewritten to `N 1 R` in all dict tokens.
    bumped: set[int] = set()
    if stream_nums and rng.random() < 0.6:
        kb = max(1, len(stream_nums) // 4)
        bumped = set(rng.sample(stream_nums, kb))
        profile["gen1_objects"] = len(bumped)
        for o in objs.values():
            t = o.toks
            for i in range(len(t) - 2):
                if (t[i + 1] == b"0" and t[i + 2] == b"R"
                        and _NUM_TOK.match(t[i])
                        and int(t[i]) in bumped):
                    t[i + 1] = b"1"

    # --- container choice ----------------------------------------------
    # hybrid = Acrobat-6-compat shape (§7.5.8.4): a classic TABLE whose
    # trailer carries /XRefStm; ObjStm-packed objects are marked FREE in
    # the table (old readers see a sparse-but-valid file) while the
    # stream supplies their real type-2 entries, which must claim slots
    # before the same revision's free rows do
    if force_container is not None:
        # encrypted bodies need the stream-capable containers (the classic
        # table/linearized shapes would leave ObjStm packing undefined)
        assert not (encrypt_aes256 and force_container
                    not in ("modern", "hybrid"))
        cname = force_container
    elif encrypt_aes256 is not None:
        cname = "modern"
    else:
        r = rng.random()
        cname = ("modern" if r < 0.38 else
                 "hybrid" if r < 0.53 else
                 "linearized" if r < 0.78 else "table")
    modern = cname in ("modern", "hybrid")
    hybrid = cname == "hybrid"
    linearized = cname == "linearized"
    profile["container"] = cname

    # encryption objects
    enc_num = None
    enc_id = None
    if encrypt_aes256 is not None:
        enc_id = encrypt_aes256[:16]
        o6, u6, oe6, ue6, perms6, aes_key = aes256_encrypt_params(
            encrypt_aes256)
        ser.aes_key = aes_key
        enc_num = next_num[0]
        next_num[0] += 1
        objs[enc_num] = _Obj(tokenize(
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44 "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF /O <" + binascii.hexlify(o6)
            + b"> /U <" + binascii.hexlify(u6) + b"> /OE <"
            + binascii.hexlify(oe6) + b"> /UE <" + binascii.hexlify(ue6)
            + b"> /Perms <" + binascii.hexlify(perms6) + b"> >>"))
        objs[enc_num].keep_direct = True

    out = bytearray()
    header_eol = rng.choice([b"\n", b"\r\n"])
    out += b"%PDF-1." + str(rng.choice([4, 5, 6, 7])).encode() + header_eol
    if rng.random() < 0.7:
        out += b"%\xe2\xe3\xcf\xd3" + header_eol
    # fixed-width profile stamp, patched in place at the end (inserting it
    # later would shift every xref offset)
    stamp_pos = len(out)
    out += b"%%foreign-profile: " + b" " * _STAMP_PAD + b"\n"

    offsets: dict[int, int] = {}
    pending_lengths: dict[int, int] = {}

    def emit_obj(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        gen = 1 if num in bumped else 0
        out.extend(b"%d %d obj" % (num, gen) + ser._sep() + body)
        out.extend(rng.choice([b"\nendobj\n", b"\r\nendobj\r\n",
                               b"\nendobj\r\n"]))

    def body_for(num: int, o: _Obj, in_objstm: bool = False) -> bytes:
        if o.payload is not None:
            return ser.emit_stream(
                num, o.toks, o.payload, pending_lengths, next_num,
                indirect_len=num in indirect,
                encrypt=ser.aes_key is not None and num != enc_num)
        return ser.emit_tokens(
            o.toks, num,
            encrypt_strings=ser.aes_key is not None and not in_objstm
            and num != enc_num)

    # a planted dead object number: appears only as a free xref entry
    free_num = next_num[0]
    next_num[0] += 1
    profile["free_entry"] = True

    if linearized:
        # Linearized-style layout (ISO 32000 Annex F shape): the
        # linearization parameter dict is the physically-first object,
        # followed by a FIRST-PAGE xref table near the head whose trailer
        # /Prev points FORWARD to the main xref table at the file tail,
        # a hint stream, the first-page object group, the remaining
        # objects, the main table, and a final startxref pointing BACK to
        # the head section — plus a mid-file `startxref 0` + %%EOF pair
        # that the tail-side backward startxref scan must not be confused
        # by. "Fast Web View" producers (Acrobat, qpdf, Ghostscript) all
        # emit this shape; the reference reads it through its ordinary
        # /Prev walk (core/core.go:1199 — the linearization data itself
        # is ignored), and so does the engine. Object numbers are NOT
        # renumbered (no reader requires it); what this class exercises
        # is the offset bookkeeping: a head xref whose rows describe
        # objects that FOLLOW it in the file.
        cat = objs[root_num]
        pent = dict_entry(cat.toks, b"/Pages")
        pages_num = int(cat.toks[pent[0]])
        pobj = objs[pages_num]
        kent = dict_entry(pobj.toks, b"/Kids")
        kid_toks = pobj.toks[kent[0]: kent[0] + kent[1]]
        kid_refs = [int(kid_toks[i]) for i in range(len(kid_toks) - 2)
                    if kid_toks[i + 2] == b"R" and _NUM_TOK.match(kid_toks[i])
                    and _NUM_TOK.match(kid_toks[i + 1])]
        page1 = kid_refs[0]
        # transitive closure of the first page's references (content
        # segments, fonts, images); the shared /Parent link is excluded
        # so sibling pages stay in the main body
        closure = {page1}
        frontier = [page1]
        while frontier:
            t = objs[frontier.pop()].toks
            for i in range(len(t) - 2):
                if (t[i + 2] == b"R" and t[i + 1] in (b"0", b"1")
                        and _NUM_TOK.match(t[i])):
                    r = int(t[i])
                    if r in objs and r != pages_num and r not in closure:
                        closure.add(r)
                        frontier.append(r)
        lin_num = next_num[0]
        next_num[0] += 1
        hint_num = next_num[0]
        next_num[0] += 1
        head_set = sorted({root_num, pages_num, lin_num, hint_num} | closure)
        profile["lin_first_page_objs"] = len(head_set)

        # hint stream: opaque deterministic payload (conforming readers
        # that don't optimize for byte-ranges never dereference it)
        hint_payload = zlib.compress(
            hashlib.sha256(("hint:" + seed).encode()).digest() * 3, 6)
        hint_body = (b"%d 0 obj\n<< /Filter /FlateDecode /S 64 /Length %d >>"
                     % (hint_num, len(hint_payload))
                     + b"\nstream\n" + hint_payload
                     + b"\nendstream\nendobj\n")

        # linearization dict with fixed-width patch slots (/L /H-offset
        # /E /T depend on the final layout; leading-zero integers are
        # legal PDF numbers, so the slots are patched in place)
        patch: dict[str, int] = {}
        offsets[lin_num] = len(out)
        out += b"%d 0 obj\n<< /Linearized 1 /L " % lin_num
        patch["L"] = len(out)
        out += b"0000000000 /H [ "
        patch["H"] = len(out)
        out += b"0000000000 %d ] /O %d /E " % (len(hint_body), page1)
        patch["E"] = len(out)
        out += b"0000000000 /N %d /T " % len(kid_refs)
        patch["T"] = len(out)
        out += b"0000000000 >>\nendobj\n"

        # first-page xref table: placeholder offsets, patched after the
        # objects it describes have been laid out further down the file
        head_xref_pos = len(out)
        row_eol = rng.choice([b" \n", b" \r", b"\r\n"])
        profile["xref_row_eol"] = row_eol.decode("latin1")
        hrows = {num: (b"0000000000 %05d n"
                       % (1 if num in bumped else 0) + row_eol)
                 for num in head_set}
        row_pos = _emit_xref_table(out, rng, profile, hrows)
        out += b"trailer\n<< /Size "
        patch["Size"] = len(out)
        out += b"0000000000 /Prev "
        patch["Prev"] = len(out)
        out += (b"0000000000 /Root %d 0 R >>\nstartxref\n0\n%%%%EOF\n"
                % root_num)

        offsets[hint_num] = len(out)
        out += hint_body

        head_objs = [root_num, pages_num, page1] + sorted(
            n for n in head_set
            if n not in (root_num, pages_num, page1, lin_num, hint_num))
        for num in head_objs:
            emit_obj(num, body_for(num, objs[num]))
            while pending_lengths and rng.random() < 0.6:
                ln, val = next(iter(pending_lengths.items()))
                del pending_lengths[ln]
                emit_obj(ln, str(val).encode())
        first_end = len(out)

        rest = [n for n in sorted(objs) if n not in set(head_objs)]
        if rng.random() < 0.7:
            rng.shuffle(rest)
            profile["shuffled"] = True
        for num in rest:
            emit_obj(num, body_for(num, objs[num]))
            while pending_lengths and rng.random() < 0.6:
                ln, val = next(iter(pending_lengths.items()))
                del pending_lengths[ln]
                emit_obj(ln, str(val).encode())
        for ln, val in list(pending_lengths.items()):
            del pending_lengths[ln]
            emit_obj(ln, str(val).encode())

        size = next_num[0]
        main_xref_pos = len(out)
        mrows = {0: b"0000000000 65535 f" + row_eol,
                 free_num: b"0000000000 00001 f" + row_eol}
        for num, off in offsets.items():
            if num in row_pos:
                continue
            mrows[num] = (b"%010d %05d n"
                          % (off, 1 if num in bumped else 0) + row_eol)
        _emit_xref_table(out, rng, profile, mrows)
        out += (b"trailer" + ser._sep()
                + ser.emit_tokens(tokenize(
                    b"<< /Size " + str(size).encode() + b" /Root "
                    + str(root_num).encode() + b" 0 R >>")))
        out += b"\nstartxref\n%d\n%%%%EOF\n" % head_xref_pos

        for num, rp in row_pos.items():
            out[rp:rp + 10] = b"%010d" % offsets[num]
        out[patch["Prev"]:patch["Prev"] + 10] = b"%010d" % main_xref_pos
        out[patch["T"]:patch["T"] + 10] = b"%010d" % main_xref_pos
        out[patch["Size"]:patch["Size"] + 10] = b"%010d" % size
        out[patch["E"]:patch["E"] + 10] = b"%010d" % first_end
        out[patch["H"]:patch["H"] + 10] = b"%010d" % offsets[hint_num]
        out[patch["L"]:patch["L"] + 10] = b"%010d" % len(out)
    elif not modern:
        order = sorted(objs)
        if rng.random() < 0.7:
            rng.shuffle(order)
            profile["shuffled"] = True
        for num in order:
            emit_obj(num, body_for(num, objs[num]))
            # forward /Length objects: emit any pending immediately after
            # a later random object (always after their stream)
            while pending_lengths and rng.random() < 0.6:
                ln, val = next(iter(pending_lengths.items()))
                del pending_lengths[ln]
                emit_obj(ln, str(val).encode())
        for ln, val in list(pending_lengths.items()):
            del pending_lengths[ln]
            emit_obj(ln, str(val).encode())

        size = next_num[0]
        xref_pos = len(out)
        # 20-byte rows end in one of the THREE legal 2-byte terminators
        # (ISO 32000 §7.5.4: SP CR, SP LF, or CR LF) — real producers use
        # all three; the reference's table parser is terminator-agnostic
        row_eol = rng.choice([b" \n", b" \r", b"\r\n"])
        profile["xref_row_eol"] = row_eol.decode("latin1")
        rows = {0: b"0000000000 65535 f" + row_eol}
        for num, off in offsets.items():
            rows[num] = (b"%010d %05d n"
                         % (off, 1 if num in bumped else 0) + row_eol)
        rows[free_num] = b"0000000000 00001 f" + row_eol
        _emit_xref_table(out, rng, profile, rows)
        out += (b"trailer" + ser._sep()
                + ser.emit_tokens(tokenize(
                    b"<< /Size " + str(size).encode() + b" /Root "
                    + str(root_num).encode() + b" 0 R >>")))
        out += b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    else:
        # modern container: pack most non-stream objects into 1-3 ObjStms
        packables = [n for n, o in objs.items()
                     if o.payload is None and not o.keep_direct]
        direct_extra = set()
        for n in packables:
            if rng.random() < 0.2:
                direct_extra.add(n)  # packing permutation: leave direct
        packed = [n for n in packables if n not in direct_extra]
        rng.shuffle(packed)
        n_stms = min(len(packed), rng.randint(1, 3)) or 1
        groups = [packed[i::n_stms] for i in range(n_stms)] if packed else []
        groups = [g for g in groups if g]
        profile["n_objstms"] = len(groups)
        profile["direct_nonstream"] = len(direct_extra)

        objstm_entries: dict[int, tuple[int, int]] = {}
        objstm_nums: list[int] = []
        for g in groups:
            stm_num = next_num[0]
            next_num[0] += 1
            for idx, num in enumerate(g):
                objstm_entries[num] = (stm_num, idx)
            payload, first = _objstm_payload(
                [(num, ser.emit_tokens(objs[num].toks, num,
                                       encrypt_strings=False))
                 for num in g])
            chain = rng.choice(_FILTER_CHAINS)
            toks = tokenize(
                b"<< /Type /ObjStm /N " + str(len(g)).encode()
                + b" /First " + str(first).encode()
                + b" /Length 0 >>")
            if len(chain) == 1:
                ftoks = [b"/" + chain[0].encode()]
            else:
                ftoks = [b"["] + [b"/" + f.encode() for f in chain] + [b"]"]
            toks = replace_entry(toks, b"/Filter", ftoks)
            stm_obj = _Obj(toks, encode_chain(payload, chain))
            objs[stm_num] = stm_obj
            objstm_nums.append(stm_num)

        emit_order = ([n for n, o in objs.items()
                       if o.payload is not None and n not in objstm_nums]
                      + list(direct_extra)
                      + ([enc_num] if enc_num is not None else [])
                      + objstm_nums)
        emit_order = list(dict.fromkeys(emit_order))
        if rng.random() < 0.7:
            rng.shuffle(emit_order)
            profile["shuffled"] = True
        pack_lens = rng.random() < 0.4
        for num in emit_order:
            emit_obj(num, body_for(num, objs[num]))
            while (not pack_lens and pending_lengths
                   and rng.random() < 0.6):
                ln, val = next(iter(pending_lengths.items()))
                del pending_lengths[ln]
                emit_obj(ln, str(val).encode())
        if pack_lens and pending_lengths:
            # pack the remaining forward-/Length targets into a FINAL
            # ObjStm: a stream's extent then depends on resolving a
            # type-2 entry (legal — only the XREF stream's /Length must
            # be direct, §7.5.8.2; the reference resolves /Length
            # through its full xref, core/core.go:1181)
            g = sorted(pending_lengths)
            payload, first = _objstm_payload(
                [(num, str(pending_lengths.pop(num)).encode())
                 for num in g])
            stm_num2 = next_num[0]
            next_num[0] += 1
            for idx, num in enumerate(g):
                objstm_entries[num] = (stm_num2, idx)
            chain = rng.choice(_FILTER_CHAINS)
            toks = tokenize(
                b"<< /Type /ObjStm /N " + str(len(g)).encode()
                + b" /First " + str(first).encode()
                + b" /Length 0 >>")
            if len(chain) == 1:
                ftoks = [b"/" + chain[0].encode()]
            else:
                ftoks = [b"["] + [b"/" + f.encode() for f in chain] + [b"]"]
            toks = replace_entry(toks, b"/Filter", ftoks)
            stm_obj = _Obj(toks, encode_chain(payload, chain))
            objs[stm_num2] = stm_obj
            emit_obj(stm_num2, body_for(stm_num2, stm_obj))
            profile["len_in_objstm"] = len(g)
        for ln, val in list(pending_lengths.items()):
            del pending_lengths[ln]
            emit_obj(ln, str(val).encode())

        # xref stream
        xref_num = next_num[0]
        next_num[0] += 1
        size = next_num[0]
        xref_pos = len(out)
        wsel = rng.choice([wv for wv in _XREF_W_CHOICES
                           if (1 << (8 * wv[1])) > xref_pos + 4096])
        profile["xref_w"] = wsel

        def row(typ: int, f2: int, f3: int) -> bytes:
            return (typ.to_bytes(wsel[0], "big")
                    + f2.to_bytes(wsel[1], "big")
                    + f3.to_bytes(wsel[2], "big"))

        entries: dict[int, bytes] = {0: row(0, 0, min(65535, (1 << (8 * wsel[2])) - 1))}
        for num, off in offsets.items():
            entries[num] = row(1, off, 1 if num in bumped else 0)
        for num, (stm, idx) in objstm_entries.items():
            entries[num] = row(2, stm, idx)
        entries[free_num] = row(0, 0, 1)
        entries[xref_num] = row(1, xref_pos, 0)
        sections = _fragment_sections(sorted(entries), rng, 0.25)
        profile["xref_index_pairs"] = len(sections)
        rows_b = bytearray()
        index: list[bytes] = []
        for sec in sections:
            index += [str(sec[0]).encode(), str(len(sec)).encode()]
            for num in sec:
                rows_b += entries[num]
        xcomp = zlib.compress(bytes(rows_b), 6)
        xd = (b"<< /Type /XRef /W [ "
              + b" ".join(str(x).encode() for x in wsel)
              + b" ] /Index [ " + b" ".join(index) + b" ] /Size "
              + str(size).encode() + b" /Root " + str(root_num).encode()
              + b" 0 R /Filter /FlateDecode /Length "
              + str(len(xcomp)).encode())
        if enc_num is not None:
            hid = binascii.hexlify(enc_id)
            xd += (b" /Encrypt " + str(enc_num).encode() + b" 0 R /ID [ <"
                   + hid + b"> <" + hid + b"> ]")
        xd += b" >>"
        offsets[xref_num] = xref_pos
        # xref stream NEVER encrypted; emit verbatim (offsets must be
        # self-consistent, so no cosmetic reflow that could confuse: the
        # tokens are emitted compactly)
        out += (str(xref_num).encode() + b" 0 obj\n" + xd
                + b"\nstream\n" + xcomp + b"\nendstream\nendobj\n")
        if not hybrid:
            out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
        else:
            # hybrid tail: classic table marks ObjStm-packed objects (and
            # the xref stream itself) FREE; /XRefStm hands a conforming
            # reader the stream's type-2 entries, which claim slots
            # BEFORE the same revision's free rows (§7.5.8.4)
            table_pos = len(out)
            row_eol = rng.choice([b" \n", b" \r", b"\r\n"])
            profile["xref_row_eol"] = row_eol.decode("latin1")
            trows = {0: b"0000000000 65535 f" + row_eol,
                     free_num: b"0000000000 00001 f" + row_eol,
                     xref_num: b"0000000000 00001 f" + row_eol}
            for num, off in offsets.items():
                if num == xref_num:
                    continue
                trows[num] = (b"%010d %05d n"
                              % (off, 1 if num in bumped else 0) + row_eol)
            for num in objstm_entries:
                trows[num] = b"0000000000 00001 f" + row_eol
            _emit_xref_table(out, rng, profile, trows)
            tdict = (b"<< /Size " + str(size).encode() + b" /Root "
                     + str(root_num).encode() + b" 0 R /XRefStm "
                     + str(xref_pos).encode())
            if enc_num is not None:
                # the classic trailer is the one a table-walking reader
                # consults (§7.5.8.4) — omitting /Encrypt there silently
                # yields ciphertext text; mirror the xref-stream dict
                hid = binascii.hexlify(enc_id)
                tdict += (b" /Encrypt " + str(enc_num).encode()
                          + b" 0 R /ID [ <" + hid + b"> <" + hid + b"> ]")
            tdict += b" >>"
            out += (b"trailer" + ser._sep() + ser.emit_tokens(tokenize(tdict)))
            out += b"\nstartxref\n%d\n%%%%EOF\n" % table_pos

    # transport wrappers: junk before %PDF- (stored offsets stay relative
    # to the header — the reader must rebase) and junk after %%EOF (the
    # reader scans backward for startxref within a bounded tail window).
    # Both are common real-world artifacts of HTTP/mail delivery; neither
    # may contain PDF keywords that could fool those scans.
    lead = tail_junk = b""
    if transport_junk and rng.random() < 0.4:
        lead = (b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n"
                b"Content-Disposition: inline; filename=%s.pdf\r\n\r\n"
                % seed.encode()[:24])
        lead += b"X" * rng.randint(0, 300)
        profile["leading_junk"] = len(lead)
    if transport_junk and rng.random() < 0.4:
        tail_junk = (b"\n--MIME-boundary-%s--\n" % seed.encode()[:16]
                     + b"." * rng.randint(0, 600))
        profile["trailing_junk"] = len(tail_junk)

    # patch the profile into the reserved comment (length-preserving)
    # `size` = next free object number — consumers appending incremental
    # updates read it from here instead of regexing /Size out of raw
    # bytes (which would also scan compressed/encrypted payloads)
    profile["size"] = next_num[0]
    if "chains" in profile:
        profile["chains"] = sorted(set(profile["chains"]))
    blob = json.dumps(profile, sort_keys=True).encode()
    assert len(blob) <= _STAMP_PAD, f"profile stamp overflow: {len(blob)}"
    start = stamp_pos + len(b"%%foreign-profile: ")
    out[start : start + len(blob)] = blob
    return lead + bytes(out) + tail_junk


def profile_of(pdf: bytes) -> dict:
    """Parse the %%foreign-profile stamp back out of the bytes."""
    m = re.search(rb"%%foreign-profile: (.+)", pdf)
    return json.loads(m.group(1)) if m else {}


# --- incremental update appendix ---------------------------------------------


def append_foreign_update(base: bytes, updates: dict[int, tuple],
                          root_num: int, size: int, seed: str,
                          encrypt_aes256: bytes | None = None,
                          frees: tuple[int, ...] = ()
                          ) -> tuple[bytes, int]:
    """Append an incremental update serialized through FOREIGN conventions
    to a (typically canonical-writer) base file — the cross-writer /Prev
    chain real files acquire when different producers touch them over
    their life. `updates` maps obj num -> (toks, payload|None); payload
    must already be encoded to match the dict's /Filter. The update's
    xref is a classic multi-row table OR an xref STREAM appended to a
    classic base (cross-FORM chain, §7.5.8 — readers dispatch per
    section), chosen per seed; the reference walks /Prev chains
    form-agnostically (core/core.go:1199) and so does the engine. In
    the stream form, updated NON-stream objects are sometimes packed
    into a fresh ObjStm behind TYPE-2 entries — the way modern writers
    incrementally save with object streams.

    Returns (whole new file, next free object number) — the size to pass
    when chaining a FURTHER update onto the result (multi-revision
    /Prev chains, each section possibly by a different writer). A
    `%%foreign-inc:` comment before the update's first object stamps the
    chosen knobs for corpus audits; chained updates each leave their own
    stamp (read them all with inc_profiles_of).

    With encrypt_aes256 (the BASE file's encryption seed), the update is
    serialized by a writer that knows the file key — the only legal way
    to incrementally update an encrypted file (§7.6.2: one encryption
    dictionary governs every revision): new stream payloads and direct
    strings are AES-256-encrypted, ObjStm-packed objects are not
    individually encrypted (their container is), and the update's xref
    stream stays plaintext.

    `frees` lists object numbers this revision DELETES (f rows / type-0
    entries): the other half of incremental semantics — writers that
    free the superseded object and allocate a replacement at a new
    number instead of overwriting in place. A newer free entry must
    shadow any older in-use entry (no object resurrection)."""
    rng = random.Random(f"inc:{seed}")
    ser = _ForeignSerializer(rng, encrypt_aes256)
    if encrypt_aes256 is not None:
        ser.aes_key = aes256_encrypt_params(encrypt_aes256)[5]
    prev = int(re.findall(rb"startxref\s+(\d+)", base)[-1])
    out = bytearray(base)
    if not out.endswith(b"\n"):
        out += b"\n"
    next_num = [size]
    pending: dict[int, int] = {}
    offsets: dict[int, int] = {}
    stamp_pos = len(out)
    out += b"%%foreign-inc: " + b" " * 256 + b"\n"

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj" % num + ser._sep() + body + b"\nendobj\n")

    # xref form chosen BEFORE emission: only an xref-STREAM section can
    # express type-2 (ObjStm-packed) entries, the way modern writers
    # (Acrobat "save", qpdf) incrementally append — updated NON-stream
    # objects get packed into a fresh ObjStm inside the update section
    use_stream = rng.random() < 0.5
    pack: dict[int, tuple] = {}
    if use_stream and rng.random() < 0.6:
        pack = {n: u for n, u in updates.items() if u[1] is None}
    objstm_entries: dict[int, int] = {}

    for num, (toks, payload) in sorted(updates.items()):
        if num in pack:
            continue
        if payload is not None:
            body = ser.emit_stream(num, toks, payload, pending, next_num,
                                   indirect_len=rng.random() < 0.5,
                                   encrypt=ser.aes_key is not None)
        else:
            body = ser.emit_tokens(
                toks, num, encrypt_strings=ser.aes_key is not None)
        emit(num, body)
        for ln in list(pending):
            emit(ln, str(pending.pop(ln)).encode())

    stm_num = None
    if pack:
        for idx, num in enumerate(sorted(pack)):
            objstm_entries[num] = idx
        payload0, first = _objstm_payload(
            [(num, ser.emit_tokens(pack[num][0], num))
             for num in sorted(pack)])
        stm_num = next_num[0]
        next_num[0] += 1
        payload0 = zlib.compress(payload0, 6)
        if ser.aes_key is not None:
            # the ObjStm container is encrypted as a stream; its packed
            # members are NOT individually encrypted (§7.6.3)
            payload0 = _aes256_stream(ser.aes_key, encrypt_aes256,
                                      stm_num, payload0)
        emit(stm_num,
             b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode"
             b" /Length %d >>" % (len(pack), first, len(payload0))
             + b"\nstream\n" + payload0 + b"\nendstream")

    profile = dict(ser.profile)
    if pack:
        profile["inc_objstm"] = len(pack)
    if ser.aes_key is not None:
        profile["inc_encrypted"] = True
    if frees:
        profile["inc_freed"] = len(frees)
    new_size = next_num[0]
    profile["inc_xref"] = "stream" if use_stream else "table"
    xref_pos = len(out)
    if not use_stream:
        row_eol = rng.choice([b" \n", b" \r", b"\r\n"])
        urows = {num: (b"%010d %05d n" % (offsets[num], 0) + row_eol)
                 if num in offsets
                 else b"0000000000 00001 f" + row_eol  # freed this revision
                 for num in sorted(set(offsets) | set(frees))}
        _emit_xref_table(out, rng, profile, urows, fragment=0.0)
        out += (b"trailer" + ser._sep() + ser.emit_tokens(tokenize(
            b"<< /Size " + str(new_size).encode() + b" /Root "
            + str(root_num).encode() + b" 0 R /Prev "
            + str(prev).encode() + b" >>")))
        out += b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    else:
        xref_num = new_size
        new_size += 1
        offsets[xref_num] = xref_pos
        # W[0] = 0 is legal when every entry is type 1 (the type field
        # defaults to 1 per ISO 32000 §7.5.8.2, Table 17) — only possible
        # when nothing is ObjStm-packed (type 2) or freed (type 0) in
        # this section
        w0 = (0 if not objstm_entries and not frees
              and rng.random() < 0.35 else 1)
        if not w0:
            profile["inc_w0_default"] = True
        rows_b = bytearray()
        index: list[bytes] = []
        sections = _fragment_sections(
            sorted(set(offsets) | set(objstm_entries) | set(frees)),
            rng, 0.0)
        for sec in sections:
            index += [str(sec[0]).encode(), str(len(sec)).encode()]
            for num in sec:
                if num in objstm_entries:
                    rows_b += (b"\x02" + stm_num.to_bytes(4, "big")
                               + objstm_entries[num].to_bytes(2, "big"))
                elif num in offsets:
                    rows_b += ((b"\x01" if w0 else b"")
                               + offsets[num].to_bytes(4, "big")
                               + (0).to_bytes(2, "big"))
                else:  # freed this revision: type 0
                    rows_b += (b"\x00" + (0).to_bytes(4, "big")
                               + (1).to_bytes(2, "big"))
        xcomp = zlib.compress(bytes(rows_b), 6)
        out += (str(xref_num).encode()
                + b" 0 obj\n<< /Type /XRef /W [ %d 4 2 ]" % w0
                + b" /Index [ " + b" ".join(index) + b" ] /Size "
                + str(new_size).encode() + b" /Root "
                + str(root_num).encode() + b" 0 R /Prev "
                + str(prev).encode()
                + b" /Filter /FlateDecode /Length "
                + str(len(xcomp)).encode() + b" >>\nstream\n" + xcomp
                + b"\nendstream\nendobj\nstartxref\n%d\n%%%%EOF\n" % xref_pos)
    blob = json.dumps(profile, sort_keys=True).encode()
    assert len(blob) <= 256, f"inc profile overflow: {len(blob)}"
    start = stamp_pos + len(b"%%foreign-inc: ")
    out[start : start + len(blob)] = blob
    return bytes(out), new_size


def inc_profiles_of(pdf: bytes) -> list[dict]:
    """All `%%foreign-inc:` stamps in file order — one per chained
    foreign update section."""
    return [json.loads(m) for m in re.findall(rb"%%foreign-inc: (.+)", pdf)]
