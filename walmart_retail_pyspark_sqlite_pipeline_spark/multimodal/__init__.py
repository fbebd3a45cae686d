from .binary import (
    attach_fake_payload,
    audio_meta,
    frame_energy,
    frame_sample,
    image_features,
    image_meta,
    image_resize,
)

__all__ = [
    "attach_fake_payload",
    "audio_meta",
    "image_meta",
    "image_resize",
    "image_features",
    "frame_sample",
    "frame_energy",
]
