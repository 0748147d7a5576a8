"""Search base class (reference ``sgl/search/base_search.py``)."""


class BaseSearch:
    def __init__(self):
        pass

    def _execute(self):
        raise NotImplementedError
