from .dacvae import DACVAE, DACVAEConfig
