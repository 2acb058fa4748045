from .convert import convert_state_dict, unused_torch_keys
