from electrocardio_panorama_tpu.utils.seeding import seed_everything
from electrocardio_panorama_tpu.utils.writer import ScalarWriter

__all__ = ["seed_everything", "ScalarWriter"]
