from .network import NetConfig, TakNet, init_network

__all__ = ["NetConfig", "TakNet", "init_network"]
