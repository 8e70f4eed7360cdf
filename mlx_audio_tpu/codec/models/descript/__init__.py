from .dac import DAC
