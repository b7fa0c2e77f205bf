from idmvton_tpu.diffusion.scheduler import DDPMScheduler
