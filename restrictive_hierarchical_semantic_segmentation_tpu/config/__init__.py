from .run import RunConfig  # noqa: F401
from .hrnet import HRNetConfig, HRNetStage, hrnet_w18, hrnet_w32, hrnet_w48, hrnet_w64, load_hrnet_yaml, resolve_hrnet_config  # noqa: F401
