"""Vendored pure-stdlib pcap (libpcap classic, the tcpdump format)
writer + reader with a REAL protocol stack inside: each record is an
Ethernet II frame carrying an IPv4 header (with a genuine RFC 1071
ones-complement checksum) and a UDP datagram.  Network captures are a
first-class ingestion format for traffic/telemetry pipelines, and the
IPv4 checksum is the oracle-checkable spec bit: the parser RECOMPUTES
it from the header words, so an engine-side hash match proves the
byte-level header math on both ends.

- :func:`encode_pcap` — classic 24-byte global header (magic
  0xa1b2c3d4, v2.4, LINKTYPE_ETHERNET) + one record header
  (ts_sec, ts_usec, incl_len, orig_len) per packet.
- :func:`parse_pcap` — validates magic/ethertype/protocol, unpacks
  the stack, recomputes the IPv4 checksum.  Truncated or non-pcap
  input raises ``ValueError``.
"""

from __future__ import annotations

import struct

_MAGIC = 0xA1B2C3D4
_LINKTYPE_ETHERNET = 1
_ETHERTYPE_IPV4 = 0x0800
_PROTO_UDP = 17


def ipv4_checksum(header: bytes) -> int:
    """RFC 1071: ones-complement of the ones-complement sum of the
    header's 16-bit big-endian words (checksum field zeroed)."""
    s = sum(
        struct.unpack(f">{len(header) // 2}H", header)
    )
    while s >> 16:
        s = (s & 0xFFFF) + (s >> 16)
    return ~s & 0xFFFF


def _ipv4_udp_packet(
    ident: int,
    src_ip: int,
    dst_ip: int,
    sport: int,
    dport: int,
    payload: bytes,
) -> bytes:
    udp_len = 8 + len(payload)
    udp = struct.pack(">HHHH", sport, dport, udp_len, 0) + payload
    total_len = 20 + udp_len
    base = struct.pack(
        ">BBHHHBBH4s4s",
        0x45,
        0,
        total_len,
        ident & 0xFFFF,
        0,
        64,
        _PROTO_UDP,
        0,
        struct.pack(">I", src_ip),
        struct.pack(">I", dst_ip),
    )
    cks = ipv4_checksum(base)
    ip = base[:10] + struct.pack(">H", cks) + base[12:]
    eth = b"\x00" * 12 + struct.pack(">H", _ETHERTYPE_IPV4)
    return eth + ip + udp


def encode_pcap(packets: list[dict]) -> bytes:
    """packets: [{ts_us, ident, src_ip, dst_ip, sport, dport,
    payload}] → classic pcap blob."""
    out = [
        struct.pack(
            ">IHHiIII", _MAGIC, 2, 4, 0, 0, 65535, _LINKTYPE_ETHERNET
        )
    ]
    for p in packets:
        frame = _ipv4_udp_packet(
            p["ident"],
            p["src_ip"],
            p["dst_ip"],
            p["sport"],
            p["dport"],
            p["payload"],
        )
        out.append(
            struct.pack(
                ">IIII",
                p["ts_us"] // 1_000_000,
                p["ts_us"] % 1_000_000,
                len(frame),
                len(frame),
            )
        )
        out.append(frame)
    return b"".join(out)


def parse_pcap(blob: bytes) -> list[dict]:
    """Walk records; per packet return ts_us / ident / src_ip / dst_ip
    / sport / dport / udp_len / ip_checksum / checksum_ok / payload."""
    if len(blob) < 24:
        raise ValueError("truncated pcap global header")
    magic, _vmaj, _vmin, _tz, _sig, _snap, link = struct.unpack(
        ">IHHiIII", blob[:24]
    )
    if magic != _MAGIC or link != _LINKTYPE_ETHERNET:
        raise ValueError("not a classic big-endian Ethernet pcap")
    pos, out = 24, []
    while pos + 16 <= len(blob):
        ts_sec, ts_usec, incl, _orig = struct.unpack(
            ">IIII", blob[pos : pos + 16]
        )
        frame = blob[pos + 16 : pos + 16 + incl]
        if len(frame) != incl:
            raise ValueError("truncated pcap record")
        pos += 16 + incl
        if len(frame) < 14:
            raise ValueError("truncated Ethernet header")
        if struct.unpack(">H", frame[12:14])[0] != _ETHERTYPE_IPV4:
            raise ValueError("non-IPv4 ethertype")
        ip = frame[14:]
        if len(ip) < 20:
            raise ValueError("truncated IPv4 header")
        ihl = (ip[0] & 0x0F) * 4
        if ihl < 20 or len(ip) < ihl:
            raise ValueError("truncated IPv4 header")
        if ip[9] != _PROTO_UDP:
            raise ValueError("non-UDP protocol")
        stored = struct.unpack(">H", ip[10:12])[0]
        recomputed = ipv4_checksum(ip[:10] + b"\x00\x00" + ip[12:ihl])
        ident = struct.unpack(">H", ip[4:6])[0]
        src_ip, dst_ip = struct.unpack(">II", ip[12:20])
        udp = ip[ihl:]
        if len(udp) < 8:
            raise ValueError("truncated UDP header")
        sport, dport, udp_len, _ucks = struct.unpack(">HHHH", udp[:8])
        out.append(
            {
                "ts_us": ts_sec * 1_000_000 + ts_usec,
                "ident": ident,
                "src_ip": src_ip,
                "dst_ip": dst_ip,
                "sport": sport,
                "dport": dport,
                "udp_len": udp_len,
                "ip_checksum": stored,
                "checksum_ok": stored == recomputed,
                "payload": udp[8 : 8 + udp_len - 8],
            }
        )
    return out
