from .device import write_device_table  # noqa: F401
from .writer import NativeWriter, write_file  # noqa: F401
