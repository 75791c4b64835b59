"""gRPC front-end mirroring proto/render/service.proto."""
