"""Ogg container walk (RFC 3533) with Vorbis (Xiph Vorbis I §4.2.2)
and Opus (RFC 7845 §5.1) identification headers — the metadata a
corpus pipeline filters web audio on: codec, channels, sample rate,
duration from the terminal granule position.

- Page framing: 'OggS' capture, version 0, header-type flags,
  64-bit granule, serial/sequence, CRC, segment lacing.  The page
  CRC is VERIFIED: CRC-32 with polynomial 0x04C11DB7, init 0, no
  reflection, xorout 0 (RFC 3533 A.1) — a corrupt page rejects the
  file rather than mis-reporting duration.
- Vorbis ID header: packet type 1 + 'vorbis', version 0, channels,
  rate, bitrates, blocksize nibbles, framing bit.  Duration =
  terminal granule / rate (granule counts PCM samples).
- OpusHead: channels, pre-skip, input rate; the granule is ALWAYS
  48 kHz samples and duration subtracts pre-skip (RFC 7845 §4).

Fixtures mux ID + comment + audio pages with closed-form fields and
real CRCs; the oracle entry reconstructs every output in SQL.
Malformed bytes raise ValueError; the Spark kernel degrades to zero
rows (codec-family convention).
"""

from __future__ import annotations

import struct

# RFC 3533 A.1 CRC: poly 0x04C11DB7, not reflected, init/xorout 0
_CRC_TABLE = []
for _b in range(256):
    _r = _b << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ b]
    return crc


def build_page(serial: int, seq: int, granule: int, header_type: int,
               packets: list[bytes]) -> bytes:
    """One Ogg page; each packet laced as 255-runs + terminator."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        lacing += b"\xff" * (n // 255) + bytes([n % 255])
        body += p
    head = struct.pack("<4sBBqIIIB", b"OggS", 0, header_type,
                       granule, serial, seq, 0, len(lacing)) \
        + bytes(lacing)
    crc = ogg_crc(head + bytes(body))
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + bytes(body)


def ogg_pages(content: bytes):
    """Yield (header_type, granule, serial, seq, packets_body) per
    page, CRC-verified."""
    pos = 0
    while pos < len(content):
        if content[pos:pos + 4] != b"OggS":
            raise ValueError("ogg: bad capture pattern")
        if len(content) < pos + 27:
            raise ValueError("ogg: truncated page header")
        (_, ver, htype, granule, serial, seq, crc, nsegs) = \
            struct.unpack_from("<4sBBqIIIB", content, pos)
        if ver != 0:
            raise ValueError("ogg: unsupported version")
        lace = content[pos + 27:pos + 27 + nsegs]
        if len(lace) != nsegs:
            raise ValueError("ogg: truncated lacing")
        body_len = sum(lace)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(content):
            raise ValueError("ogg: truncated page body")
        page = bytearray(content[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("ogg: page CRC mismatch")
        yield htype, granule, serial, seq, \
            content[pos + 27 + nsegs:page_end]
        pos = page_end


def ogg_packets(content: bytes):
    """Reassemble logical PACKETS across pages per RFC 3533 lacing:
    a packet is the concatenation of segments up to (and including)
    the first lacing value < 255; a page whose header has the
    continuation flag (0x01) extends the previous page's unfinished
    packet.  Yields packet bytes in stream order (CRC verified by
    the page walk).  A packet left unterminated at EOS raises."""
    pos = 0
    pending = bytearray()
    have_pending = False
    while pos < len(content):
        if content[pos:pos + 4] != b"OggS":
            raise ValueError("ogg: bad capture pattern")
        if len(content) < pos + 27:
            raise ValueError("ogg: truncated page header")
        (_, ver, htype, _granule, _serial, _seq, crc, nsegs) = \
            struct.unpack_from("<4sBBqIIIB", content, pos)
        if ver != 0:
            raise ValueError("ogg: unsupported version")
        lace = content[pos + 27:pos + 27 + nsegs]
        if len(lace) != nsegs:
            raise ValueError("ogg: truncated lacing")
        body_start = pos + 27 + nsegs
        page_end = body_start + sum(lace)
        if page_end > len(content):
            raise ValueError("ogg: truncated page body")
        page = bytearray(content[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("ogg: page CRC mismatch")
        if (htype & 0x01) and not have_pending:
            raise ValueError("ogg: continuation without a pending packet")
        if not (htype & 0x01) and have_pending:
            raise ValueError("ogg: pending packet not continued")
        off = body_start
        for seg in lace:
            pending += content[off:off + seg]
            off += seg
            have_pending = True
            if seg < 255:
                yield bytes(pending)
                pending = bytearray()
                have_pending = False
        pos = page_end
    if have_pending:
        raise ValueError("ogg: unterminated packet at EOS")


def ogg_packets_salvage(content: bytes):
    """Page-salvaging packet walk (r13 — the Ogg analog of the WARC
    record resync): a damaged page (bad capture pattern, truncated
    header/lacing/body, CRC mismatch, bad version) costs ITSELF —
    resync to the next ``OggS`` and COUNT one drop event — never the
    stream.  Packets broken by a lost page are discarded, not
    invented: a pending partial packet dies with the bad page, and a
    good page that CONTINUES a lost packet has its orphan tail
    segments skipped up to the first lacing < 255.  A false ``OggS``
    inside a payload fails its own CRC and costs one more resync
    event (the WARC counting convention: events, not bytes).

    -> (packets: list[bytes], dropped_pages: int).  The strict
    ``ogg_packets`` walk is unchanged — it is the differential
    anchor and the meta-entry contract."""
    packets: list[bytes] = []
    dropped = 0
    pending = bytearray()
    have_pending = False
    pos, n = 0, len(content)
    while pos < n:
        bad = None
        htype = nsegs = 0
        lace = b""
        body_start = page_end = pos
        if content[pos:pos + 4] != b"OggS" or n < pos + 27:
            bad = "frame"
        else:
            (_, ver, htype, _granule, _serial, _seq, crc, nsegs) = \
                struct.unpack_from("<4sBBqIIIB", content, pos)
            lace = content[pos + 27:pos + 27 + nsegs]
            body_start = pos + 27 + nsegs
            page_end = body_start + sum(lace)
            if ver != 0 or len(lace) != nsegs or page_end > n:
                bad = "frame"
            else:
                page = bytearray(content[pos:page_end])
                page[22:26] = b"\x00\x00\x00\x00"
                if ogg_crc(bytes(page)) != crc:
                    bad = "crc"
        if bad is not None:
            dropped += 1
            pending = bytearray()        # a broken packet dies here
            have_pending = False
            nxt = content.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        off = body_start
        segs = list(lace)
        if (htype & 0x01) and not have_pending:
            # orphan continuation of a packet lost with its page:
            # discard segments up to the first < 255 lacing
            while segs:
                seg = segs.pop(0)
                off += seg
                if seg < 255:
                    break
        elif not (htype & 0x01) and have_pending:
            # previous page ended mid-packet and nothing continued
            # it — the packet is unfinishable; counted, not invented
            dropped += 1
            pending = bytearray()
            have_pending = False
        for seg in segs:
            pending += content[off:off + seg]
            off += seg
            have_pending = True
            if seg < 255:
                packets.append(bytes(pending))
                pending = bytearray()
                have_pending = False
        pos = page_end
    if have_pending:
        # EOS mid-packet: truncation damage — drop the tail, counted
        dropped += 1
    return packets, dropped


# field order shared with the Spark kernel schema
OGG_FIELDS = ("codec", "channels", "sample_rate", "duration_ms",
              "n_pages")


def decode_ogg_meta(content: bytes) -> tuple:
    """-> (codec, channels, sample_rate, duration_ms, n_pages)."""
    first_packet = None
    last_granule = 0
    n_pages = 0
    for htype, granule, _serial, _seq, body in ogg_pages(content):
        n_pages += 1
        if n_pages == 1:
            if not htype & 0x02:
                raise ValueError("ogg: first page not BOS")
            first_packet = body
        if granule > 0:
            last_granule = granule
    if first_packet is None:
        raise ValueError("ogg: empty container")
    if first_packet[:7] == b"\x01vorbis":
        (ver, ch, rate) = struct.unpack_from("<IBI", first_packet, 7)
        if ver != 0 or ch < 1 or rate < 1:
            raise ValueError("ogg: bad vorbis id header")
        if len(first_packet) < 30 or not first_packet[29] & 1:
            raise ValueError("ogg: vorbis framing bit unset")
        dur = last_granule * 1000.0 / rate
        return ("vorbis", ch, rate, dur, n_pages)
    if first_packet[:8] == b"OpusHead":
        ver, ch, preskip, rate = struct.unpack_from(
            "<BBHI", first_packet, 8)
        if ver != 1 or ch < 1:
            raise ValueError("ogg: bad OpusHead")
        # granule is 48 kHz ticks regardless of input rate (RFC 7845)
        dur = max(0, last_granule - preskip) * 1000.0 / 48000.0
        return ("opus", ch, rate, dur, n_pages)
    raise ValueError("ogg: unknown codec id header")


# ---------------------------------------------------------------------------
# fixtures: closed-form Vorbis (even seeds) / Opus (odd seeds)
# ---------------------------------------------------------------------------

def synth_ogg(seed: int) -> bytes:
    """ID page (BOS) + comment page + two audio pages (the second
    terminal, EOS, carrying the closed-form final granule)."""
    serial = 0x1000 + seed
    ch = 1 + seed % 2
    if seed % 2 == 0:                          # Vorbis
        rate = (8000, 16000, 22050, 44100)[(seed // 2) % 4]
        ident = (b"\x01vorbis" + struct.pack("<IBI", 0, ch, rate)
                 + struct.pack("<iii", 0, 128000, 0)
                 + bytes([0x66]) + b"\x01")
        comment = (b"\x03vorbis" + struct.pack("<I", 4) + b"hbsp"
                   + struct.pack("<I", 0) + b"\x01")
        granule = rate * (1 + seed % 5)        # whole seconds
    else:                                      # Opus
        rate = (8000, 48000)[(seed // 2) % 2]
        preskip = 312
        ident = (b"OpusHead" + struct.pack("<BBHIhB", 1, ch, preskip,
                                           rate, 0, 0))
        comment = (b"OpusTags" + struct.pack("<I", 4) + b"hbsp"
                   + struct.pack("<I", 0))
        granule = preskip + 48000 * (1 + seed % 5)
    fake_audio = bytes(((seed * 31 + i) % 256) for i in range(64))
    return (build_page(serial, 0, 0, 0x02, [ident])
            + build_page(serial, 1, 0, 0x00, [comment])
            + build_page(serial, 2, granule // 2, 0x00, [fake_audio])
            + build_page(serial, 3, granule, 0x04, [fake_audio]))


def expected_ogg_fields(seed: int) -> tuple:
    ch = 1 + seed % 2
    if seed % 2 == 0:
        rate = (8000, 16000, 22050, 44100)[(seed // 2) % 4]
        return ("vorbis", ch, rate, (1 + seed % 5) * 1000.0, 4)
    rate = (8000, 48000)[(seed // 2) % 2]
    return ("opus", ch, rate, (1 + seed % 5) * 1000.0, 4)
