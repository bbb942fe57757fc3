"""Native host runtime: lock-free sample rings, build-on-demand loader."""

from melspec_tpu.runtime.ringbuffer import SampleRing, native_available

__all__ = ["SampleRing", "native_available"]
