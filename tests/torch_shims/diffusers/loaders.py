"""diffusers.loaders shim: the pipeline only inherits
TextualInversionLoaderMixin for ``maybe_convert_prompt``
(pipeline_upscale_a_video.py:61,221,286) — identity unless placeholder
tokens were registered, and the parity tests register none."""


class TextualInversionLoaderMixin:
    def maybe_convert_prompt(self, prompt, tokenizer):
        return prompt
