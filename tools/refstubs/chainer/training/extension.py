class Extension:
    trigger = (1, "iteration")
    priority = 100

    def __call__(self, trainer):
        pass


PRIORITY_WRITER = 300
PRIORITY_EDITOR = 200
PRIORITY_READER = 100
