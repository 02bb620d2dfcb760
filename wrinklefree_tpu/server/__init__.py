from .async_engine import AsyncEngine
from .http import InferenceServer, build_app, create_server
