"""Keras-facing implementations of the reference's TF-side utils API
(reference: utils.py:100-108 ``apply_kernel_regularizer``, utils.py:140-288
``AdaBelief``), used by the root ``utils.py`` shim so the reference's
utils_test.py runs unmodified against this repo.

These exist purely for interop with Keras models/tests; the framework's own
training path uses the optax/flax equivalents (train/optim.py,
train/regularizers.py), which are differentially tested against a numpy
oracle of the reference update rule.
"""

from __future__ import annotations


def apply_kernel_regularizer(model, kernel_regularizer):
    """Return a clone of ``model`` with ``kernel_regularizer`` set on every
    Dense/Conv2D layer (reference semantics: utils.py:100-108 — the clone
    re-initializes weights under the ambient RNG, which the reference's
    double-clone also did)."""
    import tensorflow as tf

    def clone_fn(layer):
        config = layer.get_config()
        if isinstance(layer, (tf.keras.layers.Dense, tf.keras.layers.Conv2D)):
            config['kernel_regularizer'] = \
                tf.keras.regularizers.serialize(kernel_regularizer)
        return layer.__class__.from_config(config)

    return tf.keras.models.clone_model(model, clone_function=clone_fn)


def make_adabelief_class():
    """Build the Keras AdaBelief optimizer class lazily (so importing the
    shim never requires TF). Update rule matches the reference
    (utils.py:140-236) and our optax ``scale_by_adabelief``:

        m_t = b1*m + (1-b1)*g
        v_t = b2*v + (1-b2)*(g - m_t)^2
        lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        p   -= lr_t * m_t / (sqrt(v_hat_t) + eps)     (v_hat: amsgrad max)
    """
    import tensorflow as tf

    class AdaBelief(tf.keras.optimizers.Optimizer):
        def __init__(self, learning_rate=0.001, beta_1=0.9, beta_2=0.999,
                     epsilon=1e-7, amsgrad=False, name='AdaBelief', **kwargs):
            super().__init__(learning_rate=learning_rate, name=name, **kwargs)
            self.beta_1 = beta_1
            self.beta_2 = beta_2
            self.epsilon = epsilon
            self.amsgrad = amsgrad

        def build(self, var_list):
            if self.built:
                return
            super().build(var_list)
            self._m = [self.add_variable_from_reference(v, 'm')
                       for v in var_list]
            self._v = [self.add_variable_from_reference(v, 'v')
                       for v in var_list]
            if self.amsgrad:
                self._vhat = [self.add_variable_from_reference(v, 'vhat')
                              for v in var_list]

        def update_step(self, gradient, variable, learning_rate):
            i = self._get_variable_index(variable)
            dt = variable.dtype
            g = tf.cast(gradient, dt)
            lr = tf.cast(learning_rate, dt)
            t = tf.cast(self.iterations + 1, dt)
            b1 = tf.cast(self.beta_1, dt)
            b2 = tf.cast(self.beta_2, dt)
            eps = tf.cast(self.epsilon, dt)

            m, v = self._m[i], self._v[i]
            self.assign(m, b1 * m + (1.0 - b1) * g)
            dev = g - m
            self.assign(v, b2 * v + (1.0 - b2) * dev * dev)
            denom = v
            if self.amsgrad:
                vhat = self._vhat[i]
                self.assign(vhat, tf.maximum(vhat, v))
                denom = vhat
            lr_t = lr * tf.sqrt(1.0 - tf.pow(b2, t)) / (1.0 - tf.pow(b1, t))
            self.assign_sub(variable, lr_t * m / (tf.sqrt(denom) + eps))

        def get_config(self):
            config = super().get_config()
            config.update(beta_1=self.beta_1, beta_2=self.beta_2,
                          epsilon=self.epsilon, amsgrad=self.amsgrad)
            return config

    return AdaBelief
