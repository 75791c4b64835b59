"""Service-layer tests: proto codec wire compatibility + in-process RPC."""

import numpy as np
import pytest

from gopbrt_tpu.service.proto import RenderRequest, RenderResponse


def _dynamic_messages():
    """Build the reference schema with google.protobuf for interop checks."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "svc_test.proto"
    fdp.package = "render"
    fdp.syntax = "proto3"
    m = fdp.message_type.add()
    m.name = "RenderRequest"
    for i, (n, t) in enumerate(
        [("scene_id", 9), ("time", 1), ("width", 5), ("height", 5)], 1
    ):
        f = m.field.add()
        f.name, f.number, f.type, f.label = n, i, t, 1
    r = fdp.message_type.add()
    r.name = "RenderResponse"
    f = r.field.add()
    f.name, f.number, f.type, f.label = "path", 1, 9, 1
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    req = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("render.RenderRequest")
    )
    resp = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("render.RenderResponse")
    )
    return req, resp


class TestProtoCodec:
    def test_request_roundtrip_self(self):
        r = RenderRequest(scene_id="abc", time=1.5, width=640, height=360)
        back = RenderRequest.FromString(r.SerializeToString())
        assert back == r

    def test_request_interop_with_protobuf(self):
        PbReq, _ = _dynamic_messages()
        mine = RenderRequest(scene_id="s1", time=2.25, width=1920, height=1080)
        theirs = PbReq.FromString(mine.SerializeToString())
        assert theirs.scene_id == "s1"
        assert theirs.time == 2.25
        assert theirs.width == 1920 and theirs.height == 1080
        # reverse direction
        t2 = PbReq(scene_id="x", time=0.5, width=7, height=9)
        back = RenderRequest.FromString(t2.SerializeToString())
        assert (back.scene_id, back.time, back.width, back.height) == (
            "x", 0.5, 7, 9,
        )

    def test_response_interop(self):
        _, PbResp = _dynamic_messages()
        mine = RenderResponse(path="build/render-x.png")
        assert PbResp.FromString(mine.SerializeToString()).path == "build/render-x.png"
        back = RenderResponse.FromString(
            PbResp(path="a/b.png").SerializeToString()
        )
        assert back.path == "a/b.png"

    def test_empty_and_defaults(self):
        assert RenderRequest.FromString(b"") == RenderRequest()
        # proto3: zero values are omitted on the wire
        assert RenderRequest(width=0).SerializeToString() == b""

    def test_unknown_fields_skipped(self):
        PbReq, _ = _dynamic_messages()
        # craft bytes with an extra varint field number 99:
        # tag = 99<<3|0 = 792 -> varint [0x98, 0x06], value 42
        extra = PbReq(width=5).SerializeToString() + bytes([0x98, 0x06, 42])
        back = RenderRequest.FromString(extra)
        assert back.width == 5

    def test_garbage_raises(self):
        with pytest.raises(Exception):
            RenderRequest.FromString(b"\xff\xff\xff\xff")


class TestServiceHandler:
    def test_render_rpc_in_process(self, tmp_path):
        """Spin the real grpc server on a scratch port, render 8x8."""
        import grpc

        from gopbrt_tpu.service.server import RenderService, make_server

        svc = RenderService(use_mesh=False, out_dir=str(tmp_path))
        server = make_server(port=0, service=svc)
        port = server.add_insecure_port("localhost:0")
        server.start()
        try:
            chan = grpc.insecure_channel(f"localhost:{port}")
            stub = chan.unary_unary(
                "/render.Render/Render",
                request_serializer=RenderRequest.SerializeToString,
                response_deserializer=RenderResponse.FromString,
            )
            resp = stub(RenderRequest(width=8, height=8), timeout=560)
            assert resp.path.endswith(".png")
            from PIL import Image

            im = Image.open(resp.path)
            assert im.size == (8, 8)
        finally:
            server.stop(grace=None)
