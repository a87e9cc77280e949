from .checkpoint import (latest_step, load_model, restore_train_state,
                         save_model, save_train_state)
