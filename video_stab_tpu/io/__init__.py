"""Host runtime: frame sources/sinks, named-channel stream graph with
hot-switchable routing (the gstd/interpipe analog), TCP + REST control, and
the application orchestrator."""

from video_stab_tpu.io.sources import (
    FrameSource,
    OpenCVSource,
    SourceParams,
    SyntheticSource,
    open_source,
)
from video_stab_tpu.io.sinks import (
    CallbackSink,
    EncoderParams,
    FileSink,
    FrameSink,
    MJPEGServer,
    NullSink,
    bitrate_bps_app,
    bitrate_kbps_server,
    open_sink,
)
from video_stab_tpu.io.channels import Channel, ChannelBridge, Pipeline, StreamGraph
from video_stab_tpu.io.daemon import GraphDaemonClient
from video_stab_tpu.io.packets import (
    ContainerPacketSource,
    PacketDecoderBridge,
    PacketEncoderBridge,
    PacketFileSink,
    PacketRelay,
    PacketSource,
    RtspPacketSource,
    open_packet_sink,
    open_packet_source,
)
from video_stab_tpu.io.control import (
    ConfigRestServer,
    TcpReceiver,
    TcpReciever,
    apply_rest_update,
)
from video_stab_tpu.io.remote import RemoteFrameServer, RemoteFrameSink
from video_stab_tpu.io.runner import StabilizerApp, run_app

__all__ = [
    "FrameSource", "OpenCVSource", "SyntheticSource", "SourceParams",
    "open_source",
    "FrameSink", "FileSink", "NullSink", "CallbackSink", "MJPEGServer",
    "EncoderParams", "open_sink", "bitrate_kbps_server", "bitrate_bps_app",
    "Channel", "ChannelBridge", "Pipeline", "StreamGraph",
    "GraphDaemonClient",
    "TcpReceiver", "TcpReciever", "ConfigRestServer", "apply_rest_update",
    "RemoteFrameSink", "RemoteFrameServer",
    "StabilizerApp", "run_app",
]
