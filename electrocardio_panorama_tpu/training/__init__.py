from electrocardio_panorama_tpu.training.checkpoint import CheckPointer
from electrocardio_panorama_tpu.training.metrics import psnr, psnr_masked, ssim, ssim_1d
from electrocardio_panorama_tpu.training.optim import get_optimizer, lr_for_epoch, set_lr
from electrocardio_panorama_tpu.training.solver import Solver, gen_lead_count
from electrocardio_panorama_tpu.training.torch_import import (
    import_torch_pkl,
    import_torch_state_dict,
    split_params_state,
)

__all__ = [
    "CheckPointer",
    "Solver",
    "gen_lead_count",
    "psnr",
    "ssim",
    "ssim_1d",
    "psnr_masked",
    "get_optimizer",
    "lr_for_epoch",
    "set_lr",
    "import_torch_pkl",
    "import_torch_state_dict",
    "split_params_state",
]
