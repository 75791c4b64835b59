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


    def test_spp_depth_superset_fields(self):
        """Fields 5/6 (spp, max_depth) round-trip and are skipped cleanly by
        a peer that only knows the reference schema."""
        PbReq, _ = _dynamic_messages()
        mine = RenderRequest(scene_id="demo", width=4, height=4, spp=7, max_depth=3)
        theirs = PbReq.FromString(mine.SerializeToString())  # 5/6 -> unknown
        assert theirs.width == 4 and theirs.scene_id == "demo"
        back = RenderRequest.FromString(mine.SerializeToString())
        assert back.spp == 7 and back.max_depth == 3


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
            resp = stub(
                RenderRequest(width=8, height=8, spp=2, max_depth=2, time=0.5),
                timeout=560,
            )
            assert resp.path.endswith(".png")
            from PIL import Image

            im = Image.open(resp.path)
            assert im.size == (8, 8)
        finally:
            server.stop(grace=None)


class TestReflection:
    """The hand-rolled server reflection (service/reflection.py) — the
    reference registers reflection at cmd/pbrtd/main.go:28; grpcurl-style
    clients discover services + schema without proto files."""

    @staticmethod
    def _start():
        import grpc

        from gopbrt_tpu.service.server import RenderService, make_server

        svc = RenderService(use_mesh=False)
        server = make_server(port=0, service=svc)
        port = server.add_insecure_port("localhost:0")
        server.start()
        chan = grpc.insecure_channel(f"localhost:{port}")
        return server, chan

    @staticmethod
    def _call(chan, service, payload: bytes) -> bytes:
        stub = chan.stream_stream(
            f"/{service}/ServerReflectionInfo",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        return next(iter(stub(iter([payload]), timeout=30)))

    @staticmethod
    def _parse_response(buf: bytes) -> dict:
        from gopbrt_tpu.service.proto import _decode_varint, _skip_field

        out = {}
        i = 0
        while i < len(buf):
            tag, i = _decode_varint(buf, i)
            field, wt = tag >> 3, tag & 7
            if wt == 2:
                ln, i = _decode_varint(buf, i)
                out[field] = buf[i : i + ln]
                i += ln
            else:
                i = _skip_field(buf, i, wt)
        return out

    @pytest.mark.parametrize(
        "service",
        [
            "grpc.reflection.v1.ServerReflection",
            "grpc.reflection.v1alpha.ServerReflection",
        ],
    )
    def test_list_services(self, service):
        from gopbrt_tpu.service.proto import _encode_varint

        server, chan = self._start()
        try:
            # ServerReflectionRequest{list_services="*"} = field 7 LD
            payload = bytes([7 << 3 | 2, 1]) + b"*"
            resp = self._parse_response(self._call(chan, service, payload))
            assert 6 in resp  # list_services_response
            assert b"render.Render" in resp[6]
        finally:
            server.stop(grace=None)

    def test_file_containing_symbol(self):
        from google.protobuf import descriptor_pb2

        server, chan = self._start()
        try:
            sym = b"render.Render"
            payload = bytes([4 << 3 | 2, len(sym)]) + sym
            resp = self._parse_response(
                self._call(chan, "grpc.reflection.v1.ServerReflection", payload)
            )
            assert 4 in resp  # file_descriptor_response
            inner = self._parse_response(resp[4])
            fdp = descriptor_pb2.FileDescriptorProto.FromString(inner[1])
            assert fdp.package == "render"
            assert fdp.service[0].name == "Render"
            names = [f.name for f in fdp.message_type[0].field]
            assert names[:4] == ["scene_id", "time", "width", "height"]
        finally:
            server.stop(grace=None)

    def test_unknown_symbol_errors(self):
        server, chan = self._start()
        try:
            sym = b"nope.Nothing"
            payload = bytes([4 << 3 | 2, len(sym)]) + sym
            resp = self._parse_response(
                self._call(chan, "grpc.reflection.v1alpha.ServerReflection", payload)
            )
            assert 7 in resp  # error_response (NOT_FOUND)
        finally:
            server.stop(grace=None)
