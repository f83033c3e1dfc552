from .media import (  # noqa: F401
    MEDIA_SCHEMA,
    FakeImageDecoder,
    MediaDecodeStage,
    frame_sample_stage,
)
