"""Wire protocol for the real-time client boundary.

The reference's real-time boundary is the C++ node calling the generated
`acados_solve()` in-process at 20 Hz (reference
catkin_ws/src/nmpc_ca/src/nmpc_guidance_ca1.cpp:577).  On TPU the solver
lives behind a device runtime, so the native boundary becomes a Unix-domain
socket speaking fixed-size little-endian frames between a C++ client
(rt/client/nmpc_rt_client.h) and the serving engine (rt/server.py).  The
frame layout is mirrored byte-for-byte in the C++ header; both sides
static-assert the sizes.

Request frame  (REQ_MAGIC):  magic u32 | seq u32 | x0 f32[8] |
                             p_obs f32[16] | r_obs f32[8]
Response frame (RESP_MAGIC): magic u32 | seq u32 | status u32 |
                             u0 f32 | x1 f32[8]

A `seq` echo lets the client detect stale replies after timeouts.  One
connection = one vehicle = one warm-start lane on the server.
"""

import struct
from typing import NamedTuple

REQ_MAGIC = 0x4E4D5043   # "NMPC"
RESP_MAGIC = 0x4E4D5052  # "NMPR"

NX = 8
NP = 16
NH = 8

REQ_FMT = "<II8f16f8f"
RESP_FMT = "<III f 8f".replace(" ", "")
REQ_SIZE = struct.calcsize(REQ_FMT)     # 136
RESP_SIZE = struct.calcsize(RESP_FMT)   # 48


class Request(NamedTuple):
    seq: int
    x0: tuple
    p_obs: tuple
    r_obs: tuple


class Response(NamedTuple):
    seq: int
    status: int
    u0: float
    x1: tuple


def pack_request(req: Request) -> bytes:
    return struct.pack(REQ_FMT, REQ_MAGIC, req.seq,
                       *req.x0, *req.p_obs, *req.r_obs)


def unpack_request(buf: bytes) -> Request:
    vals = struct.unpack(REQ_FMT, buf)
    if vals[0] != REQ_MAGIC:
        raise ValueError(f"bad request magic 0x{vals[0]:08x}")
    return Request(seq=vals[1], x0=vals[2:2 + NX],
                   p_obs=vals[2 + NX:2 + NX + NP],
                   r_obs=vals[2 + NX + NP:])


def pack_response(resp: Response) -> bytes:
    return struct.pack(RESP_FMT, RESP_MAGIC, resp.seq, resp.status,
                       resp.u0, *resp.x1)


def unpack_response(buf: bytes) -> Response:
    vals = struct.unpack(RESP_FMT, buf)
    if vals[0] != RESP_MAGIC:
        raise ValueError(f"bad response magic 0x{vals[0]:08x}")
    return Response(seq=vals[1], status=vals[2], u0=vals[3], x1=vals[4:])
