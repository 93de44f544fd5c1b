import jax
def test_backend():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
