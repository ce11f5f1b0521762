from alpha_zero_tpu.utils.coords import CoordsConvertor  # noqa: F401
from alpha_zero_tpu.utils.csv_writer import CsvWriter  # noqa: F401
from alpha_zero_tpu.utils.logging import Timer, create_logger, get_time_stamp  # noqa: F401
