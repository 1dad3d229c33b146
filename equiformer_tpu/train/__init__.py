from .engine import AverageMeter, make_dens_steps, make_md17_steps, make_qm9_steps, masked_mean
from .optim import (
    cosine_warmup_schedule,
    create_optimizer,
    ema_update,
    multistep_warmup_schedule,
    no_weight_decay_mask,
)
from .state import TrainState
from .oc20_engine import (
    aux_weight_schedule,
    interpolate_init_relaxed_pos,
    make_oc20_steps,
    with_grad_accumulation,
)
