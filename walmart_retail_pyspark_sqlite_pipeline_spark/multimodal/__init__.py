from .binary import attach_fake_payload, frame_sample, image_meta

__all__ = ["attach_fake_payload", "image_meta", "frame_sample"]
