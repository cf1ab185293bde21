"""Visual-RL integration: PPO training loop streaming rendered frames."""

from .ppo import PPOConfig, init_policy_params, make_train_step

__all__ = ["PPOConfig", "init_policy_params", "make_train_step"]
