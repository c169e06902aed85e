"""CFHD bitstream syntax layer: sample writer and parser (host-side)."""

from cineform_tpu.bitstream.parser import parse_sample, IntraSample, ChannelInfo, BandInfo
from cineform_tpu.bitstream.writer import SampleWriter

__all__ = ["parse_sample", "IntraSample", "ChannelInfo", "BandInfo", "SampleWriter"]
