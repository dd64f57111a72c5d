import dataclasses
from typing import Any, Optional

from ...utils import BaseOutput


@dataclasses.dataclass
class StableDiffusionPipelineOutput(BaseOutput):
    images: Any = None
    nsfw_content_detected: Optional[Any] = None
