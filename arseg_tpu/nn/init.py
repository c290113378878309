"""Torch-parity parameter initializers (distributional parity, JAX PRNG).

The reference mixes several schemes: torch Conv2d/Linear defaults
(kaiming_uniform with a=sqrt(5) + uniform bias), kaiming_normal_(a=1) in the
BiSeNet/attention init_weight methods, N(0, sqrt(2/n)) in the dilated ResNet
(`model/extractors.py:122-128`), and xavier_normal_ for the pixel-shuffle
projection (`model/bisenet.py:203-204`).
"""

import math

import jax
import jax.numpy as jnp


class RngStream:
    def __init__(self, key):
        self.key = key

    def __call__(self):
        self.key, sub = jax.random.split(self.key)
        return sub


def _conv_fans(kh, kw, cin_per_group, cout):
    fan_in = kh * kw * cin_per_group
    fan_out = kh * kw * cout  # torch fan_out ignores groups divisor on cout? it divides by groups; unused here
    return fan_in, fan_out


def conv_kaiming_uniform(rng, kh, kw, cin_per_group, cout, bias=True):
    """torch Conv2d default init (kaiming_uniform_, a=sqrt(5))."""
    fan_in, _ = _conv_fans(kh, kw, cin_per_group, cout)
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "weight": jax.random.uniform(
            rng(), (kh, kw, cin_per_group, cout), minval=-bound, maxval=bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(rng(), (cout,), minval=-bound, maxval=bound)
    return p


def conv_kaiming_normal_a1(rng, kh, kw, cin_per_group, cout, bias=True):
    """kaiming_normal_(a=1) + zero bias (BiSeNet/attention init_weight)."""
    fan_in, _ = _conv_fans(kh, kw, cin_per_group, cout)
    std = 1.0 / math.sqrt(fan_in)  # gain = sqrt(2/(1+1)) = 1
    p = {"weight": std * jax.random.normal(rng(), (kh, kw, cin_per_group, cout))}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def conv_msra(rng, kh, kw, cin_per_group, cout, bias=False):
    """N(0, sqrt(2/n)), n = kh*kw*cout (reference model/extractors.py:122-125)."""
    std = math.sqrt(2.0 / (kh * kw * cout))
    p = {"weight": std * jax.random.normal(rng(), (kh, kw, cin_per_group, cout))}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def conv_xavier_normal(rng, kh, kw, cin, cout, bias=True):
    fan_in, fan_out = _conv_fans(kh, kw, cin, cout)
    std = math.sqrt(2.0 / (fan_in + fan_out))
    p = {"weight": std * jax.random.normal(rng(), (kh, kw, cin, cout))}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(rng(), (cout,), minval=-bound, maxval=bound)
    return p


def linear_default(rng, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    return {
        "weight": jax.random.uniform(rng(), (cin, cout), minval=-bound, maxval=bound),
        "bias": jax.random.uniform(rng(), (cout,), minval=-bound, maxval=bound),
    }


def bn_default(c):
    return {
        "weight": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "running_mean": jnp.zeros((c,)),
        "running_var": jnp.ones((c,)),
    }


def prelu_default():
    return {"weight": jnp.full((1,), 0.25)}


def mha_default(rng, embed_dim):
    """torch nn.MultiheadAttention(num_heads=1) parameter layout.

    in_proj_weight [3E, E] xavier_uniform, in_proj_bias zeros, out_proj
    Linear default weight + zero bias. Stored transposed for x @ W use."""
    bound = math.sqrt(6.0 / (3 * embed_dim + embed_dim))
    in_proj = jax.random.uniform(
        rng(), (3 * embed_dim, embed_dim), minval=-bound, maxval=bound
    )
    lin_bound = 1.0 / math.sqrt(embed_dim)
    return {
        "in_proj_weight": in_proj,  # kept in torch layout [3E, E]
        "in_proj_bias": jnp.zeros((3 * embed_dim,)),
        "out_proj": {
            "weight": jax.random.uniform(
                rng(), (embed_dim, embed_dim), minval=-lin_bound, maxval=lin_bound
            ),
            "bias": jnp.zeros((embed_dim,)),
        },
    }
