from .checkpoint import (latest_step, load_model, restore_train_state,
                         save_model, save_train_state,
                         wait_for_pending_saves)
from .import_2d import (export_2d_state, import_torch_edm2,
                        torch_state_dict_to_numpy)
from .misc import (EasyDict, assert_shape, compare_caches, find_nonfinite,
                   nan_guard, tile_images)
from .profiling import annotate, benchmark, trace
from .stats import Collector, report, report0
