import jax
def test_backend():
    print("BACKEND:", jax.default_backend(), "NDEV:", jax.device_count())
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
